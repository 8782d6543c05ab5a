"""Temporal joins Spark lacks as built-ins: as-of join and bounded range
join (charter: operators a training-data/eventstream pipeline needs).

Both avoid the naive inequality-join blowup:

* **asof_join** — the union-marker pattern: tag both sides, union, one
  shuffle on the key, sort within partition by (ts, side), then a
  running ``last(right_payload, ignoreNulls)`` window carries the most
  recent right row forward onto each left row.  Cost = one shuffle +
  one sort over |L|+|R| rows — no pairwise expansion, no skew from
  popular keys beyond what the key distribution itself has.  This is
  how you as-of join two 10-TB tables.
* **range_join** — bucketize time into ``window_span`` bins; a right
  row in [t-w, t] can only live in the left row's bin or the previous
  one, so exploding each left row to 2 bucket keys turns the range
  predicate into an equi-join on (key, bucket) + a residual filter.
  Exchange stays hash-partitioned; the residual filter is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_payload: list[str] | None = None,
    tolerance_ms: int | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` on the same key (DuckDB/pandas ``ASOF JOIN``
    semantics, inclusive).

    ``right_payload`` — right columns to carry (default: all but key/ts).
    ``tolerance_ms`` — optional max staleness; older matches become NULL.
    ``tie_break`` — right column deciding which row wins when several
    right rows share the SAME (key, ts): the max ``tie_break`` row.
    Without it the winner is partition-order-dependent (``last`` over a
    window ordered only by (ts, side) is not total under duplicate
    timestamps), which flaps hash gates; pass a unique right id whenever
    the right side can carry duplicate timestamps per key.
    Returns left columns + ``asof_ts`` + payload columns (NULL when no
    prior right row exists).
    """
    right_payload = right_payload or [c for c in right.columns if c not in (key, ts)]
    l_tag = left.withColumn("__side", F.lit(1))
    tie_col = F.col(tie_break) if tie_break else F.lit(0)
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("__side"),
        tie_col.alias("__tie"),
        F.col(ts).alias("__r_ts"),
        F.struct(*[F.col(c) for c in right_payload]).alias("__payload"),
    )
    l_cols = [c for c in left.columns]
    unioned = l_tag.select(
        *l_cols,
        F.col("__side"),
        F.lit(None).cast(r_tag.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast("timestamp").alias("__r_ts"),
        F.lit(None).cast(r_tag.schema["__payload"].dataType).alias("__payload"),
    ).unionByName(
        r_tag.select(
            *[
                F.col(c) if c in (key, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in l_cols
            ],
            "__side",
            "__tie",
            "__r_ts",
            "__payload",
        )
    )
    # right rows sort before left rows at equal ts → inclusive semantics;
    # among same-(key, ts) right rows the max __tie sorts last, so
    # last(..) carries it — a total order when tie_break is a unique id
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("__side"), F.asc_nulls_first("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__asof_ts", F.last("__r_ts", ignorenulls=True).over(w)).withColumn(
        "__asof_payload", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_ms is not None:
        fresh = (
            F.col(ts).cast("double") - F.col("__asof_ts").cast("double")
        ) * 1000 <= F.lit(tolerance_ms)
        out = out.withColumn("__asof_ts", F.when(fresh, F.col("__asof_ts"))).withColumn(
            "__asof_payload", F.when(fresh, F.col("__asof_payload"))
        )
    return out.select(
        *l_cols,
        F.col("__asof_ts").alias("asof_ts"),
        *[F.col("__asof_payload")[c].alias(c) for c in right_payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_ms: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """All (left, right) pairs on the same key with
    ``left.ts - window <= right.ts <= left.ts``.

    Bucketized equi-join: right rows land in bucket floor(ts/w); a left
    row's matches can only be in its bucket or the one before, so the
    left explodes to those two bucket keys.  2x left duplication buys an
    equi-join instead of a per-key cross product.
    Returns left columns + right columns suffixed ``_r``.
    """
    w_us = window_ms * 1000  # microsecond precision to match timestamps
    # exact integer division: a double quotient truncation could misplace
    # rows landing exactly on a bucket boundary
    l_bkt = F.expr(f"unix_micros({left_ts}) div {w_us}")
    r_bkt = F.expr(f"unix_micros({right_ts}) div {w_us}")
    l_exp = left.withColumn("__bkt", F.explode(F.array(l_bkt - 1, l_bkt)))
    r_cols = [F.col(c).alias(f"{c}_r") for c in right.columns if c != key]
    r_exp = right.select(F.col(key), r_bkt.alias("__bkt"), *r_cols)
    cond = (
        (F.col(f"{right_ts}_r") <= F.col(left_ts))
        & (F.unix_micros(F.col(f"{right_ts}_r")) > F.unix_micros(F.col(left_ts)) - w_us)
    )
    return l_exp.join(r_exp, on=[key, "__bkt"]).filter(cond).drop("__bkt")


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_id: str,
    ts: str = "ts",
    right_ts: str = "ts",
    tolerance_us: int = 3_600_000_000,
    right_payload: list[str] | None = None,
    tie_break: str | None = None,
) -> DataFrame:
    """Nearest-in-time match within ±tolerance (the bidirectional as-of
    variant: ``asof_join`` looks only backward).  For each left row,
    the right row on the same key minimizing |left.ts - right.ts|,
    dropped when nothing falls inside the tolerance window.

    Scale shape: BAND-BUCKETED equi-join — both sides bucket their
    timestamp by the tolerance (``b = unix_micros div tol``), the left
    probes buckets {b-1, b, b+1} (any within-tolerance neighbor lands
    there), and ranking runs per left row over the bounded candidate
    set.  No range predicate ever reaches a join condition, so Catalyst
    plans a plain shuffled equi-join at any scale; candidates per row
    track event density within one tolerance window, not table size.

    Determinism: rank orders by (gap_us, right ts, ``tie_break``) —
    pass a unique right id whenever two right rows can share a
    timestamp, same contract as ``asof_join``.  Returns (left_id, key,
    left ts, asof_ts, gap_us, payload...).
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    tol = int(tolerance_us)
    # tolerance 0 = exact-timestamp match only; the gap filter below
    # already enforces it, so only the bucket divisor needs clamping
    # (unix_micros div 0 is a divide-by-zero — round-6 as-of fuzz)
    bucket_w = max(tol, 1)
    l_b = F.floor(F.unix_micros(F.col(ts)) / F.lit(bucket_w)).cast("long")
    r_b = F.floor(F.unix_micros(F.col(right_ts)) / F.lit(bucket_w)).cast("long")
    l = left.select(
        F.col(left_id), F.col(key), F.col(ts), F.explode(
            F.array(l_b - 1, l_b, l_b + 1)
        ).alias("__b"),
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__r_ts"),
        r_b.alias("__b"),
        *[F.col(c) for c in right_payload],
    )
    gap = F.abs(F.unix_micros(F.col(ts)) - F.unix_micros(F.col("__r_ts")))
    tie = F.col(tie_break) if tie_break else F.lit(0)
    w = Window.partitionBy(left_id).orderBy(
        F.col("__gap"), F.col("__r_ts"), tie
    )
    return (
        l.join(r, [key, "__b"])
        .withColumn("__gap", gap)
        .filter(F.col("__gap") <= tol)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            left_id,
            key,
            ts,
            F.col("__r_ts").alias("asof_ts"),
            F.col("__gap").alias("gap_us"),
            *right_payload,
        )
    )
