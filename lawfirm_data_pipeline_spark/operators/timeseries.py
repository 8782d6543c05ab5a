"""Time-series resample + gap-fill over the events table.

The hypertable-rollup shape (charter: "operations a large-scale
training-data pipeline would need"): bucket irregular events to a fixed
grid, materialize the missing buckets, and carry the last observation
forward so every (key, bucket) cell has a value.

Scale shape, stage by stage:

1. **bucket aggregate** — `groupBy(key, date_trunc(...))` with integer
   (micros) sums: partial aggregation collapses each map partition to
   ~|keys × buckets| rows before the shuffle, so the shuffle is sized by
   the grid, not the raw event count.
2. **grid generation** — `sequence(min, max, interval)` + `explode` per
   key: pure map-side on the (small) per-key span table, no shuffle, no
   driver loop; grid cardinality is explicit (span/step) so a runaway
   key range fails fast rather than OOMing an executor.
3. **gap-fill** — `last(value, ignorenulls=True)` over a ROWS window
   per key: one shuffle on the key, the same partitioning the join in
   stage 2's output already wants (AQE reuses it).

Values are aggregated as integer micros so the forward-filled column is
exact — float sums would make the hash gate order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from lawfirm_data_pipeline_spark.functions.rounding import bfround


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "hour",
    step: str = "1 hour",
) -> DataFrame:
    """Resample ``value`` to per-``unit`` buckets per key and
    forward-fill empty buckets.

    Returns (key, bucket, n, sum_micros, filled_micros, is_gap): ``n``
    and ``sum_micros`` are the observed per-bucket count / integer-micro
    sum (sum NULL in gap buckets), ``filled_micros`` carries the last
    observed sum forward, ``is_gap`` flags synthesized buckets.
    """
    micros = bfround(F.col(value_col) * 1e6).cast("long")
    b = events.groupBy(
        F.col(key_col), F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ).agg(
        F.sum(micros).alias("sum_micros"),
        F.count(F.lit(1)).alias("n"),
    )
    span = b.groupBy(key_col).agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = span.select(
        key_col, F.explode(F.expr(f"sequence(mn, mx, interval {step})")).alias("bucket")
    )
    j = grid.join(b, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        key_col,
        "bucket",
        F.coalesce("n", F.lit(0)).alias("n"),
        "sum_micros",
        F.last("sum_micros", ignorenulls=True).over(w).alias("filled_micros"),
        F.col("n").isNull().alias("is_gap"),
    )


def state_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Collapse an event stream into effective-dated state intervals
    (gaps-and-islands): one row per maximal run of consecutive equal
    states per key — the SCD-2 "dimension history build" over a raw
    change feed.

    Plan: island ids are a boundary flag (state != lag(state)) summed
    cumulatively, then one aggregate per island — all three steps share
    the key partitioning, so Catalyst plans a SINGLE exchange.  Output
    cardinality is the number of state runs (<= input rows).  Ordering
    is (ts, tiebreak) per the repo-wide deterministic tie-break.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    flagged = df.withColumn(
        "_new",
        F.when(
            F.lag(state_col).over(w).isNull()
            | (F.lag(state_col).over(w) != F.col(state_col)),
            1,
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return flagged.groupBy(key_col, "island").agg(
        F.min(state_col).alias("state"),
        F.min(ts_col).alias("valid_from"),
        F.max(ts_col).alias("valid_to"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def max_concurrency(
    intervals: DataFrame,
    group_col: str = "state",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Peak number of simultaneously-open intervals per group (the
    "max concurrent sessions" metric), via the +1/-1 sweep: explode
    each interval into a start(+1) and end(-1) event, running-sum in
    time order, take the max.

    Determinism under ties: at an identical timestamp, +1 events sort
    before -1 (delta DESC), so touching intervals count as concurrent
    and — because tied rows then all carry the SAME delta — every
    ordering of the remaining ties yields the same prefix-sum multiset,
    hence the same max.  The window partitions by group; for a GLOBAL
    concurrency curve at 100 TB, the same sweep runs as the two-phase
    distributed prefix sum used by operators/packing (chunk-local sums
    + broadcast chunk offsets), never a single-partition window.
    """
    points = intervals.select(
        F.col(group_col).alias("g"),
        F.explode(
            F.array(
                F.struct(F.col(from_col).alias("ts"), F.lit(1).alias("delta")),
                F.struct(F.col(to_col).alias("ts"), F.lit(-1).alias("delta")),
            )
        ).alias("p"),
    ).select("g", "p.ts", "p.delta")
    w = (
        Window.partitionBy("g")
        .orderBy(F.col("ts"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = points.withColumn("open", F.sum("delta").over(w))
    return running.groupBy(F.col("g").alias(group_col)).agg(
        F.max("open").cast("long").alias("peak_concurrency"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )
