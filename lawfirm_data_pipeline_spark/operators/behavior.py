"""Behavioral event analytics: sequential funnels and cohort retention.

Charter §2.C additions over the ``events`` table — the product-analytics
queries every event warehouse runs (the reference's only event table,
``CrmSyncEvent``, records one outcome row per company; these operators
generalize that to the full event-stream case, SURVEY.md §2.C).

Scale posture:

* ``funnel_steps`` — strict-order funnel (first A, then first B after
  it, then first C after that) computed with THREE stacked aggregate
  windows over ONE ``partitionBy(user)`` exchange: the step-k timestamp
  depends on step-k-1, so each is a ``min(CASE WHEN …)`` window over the
  same partitioning — Catalyst plans a single shuffle, three Window
  operators back-to-back, no self-joins of the event table.  The event
  scan is pre-filtered to the funnel's own types, so the exchange never
  carries unrelated events.
* ``cohort_retention`` — two aggregations sharing the user_id shuffle
  key (first-touch cohort per user, then (cohort, offset) counts); the
  cohort table joins back on user_id co-partitioned.  No window, no
  driver-side state; output is O(cohorts × offsets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from lawfirm_data_pipeline_spark.functions.rounding import bfround


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-sequence funnel: users whose first ``steps[k]`` event
    occurs AFTER their committed step-k-1 time, for every k.

    Returns one row per step: ``(step_idx, step, n_users,
    conversion)`` where conversion is the fraction of step-0 users
    (rounded to 6; 0-user funnels yield conversion null).
    """
    filtered = events.select(user_col, ts_col, type_col).filter(
        F.col(type_col).isin(list(steps))
    )
    w = Window.partitionBy(user_col)
    cur = filtered
    t_cols = []
    for k, step in enumerate(steps):
        cond = F.col(type_col) == step
        if k > 0:
            cond = cond & (F.col(ts_col) > F.col(t_cols[k - 1]))
        tcol = f"__t{k}"
        cur = cur.withColumn(tcol, F.min(F.when(cond, F.col(ts_col))).over(w))
        t_cols.append(tcol)
    per_user = cur.groupBy(user_col).agg(
        *[F.max(t).alias(t) for t in t_cols]
    )
    counts = per_user.agg(
        *[F.count(t).alias(f"__n{k}") for k, t in enumerate(t_cols)]
    )
    # one tiny row -> per-step long form.  Conversion is computed INSIDE
    # this single-row reshape: a separate base-count branch would make
    # Catalyst re-derive the whole window pipeline a second time (plans
    # are trees, not DAGs — a second reference duplicates the subtree).
    return counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("step_idx"),
                        F.lit(step).alias("step"),
                        F.col(f"__n{k}").alias("n_users"),
                        # try_divide: a funnel whose first step converted
                        # nobody yields NULL conversions (ANSI division
                        # would throw; DuckDB's x/0 is NULL — parity)
                        bfround(F.try_divide(F.col(f"__n{k}"), F.col("__n0")), 6).alias(
                            "conversion"
                        ),
                    )
                    for k, step in enumerate(steps)
                ]
            )
        ).alias("s")
    ).select("s.step_idx", "s.step", "s.n_users", "s.conversion")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = week of a user's first event;
    a (cohort, offset) cell counts distinct users active ``offset``
    weeks after their cohort week.

    Returns ``(cohort_week, week_offset, n_users)``.
    """
    firsts = events.groupBy(user_col).agg(F.min(ts_col).alias("__first"))
    cohorts = firsts.select(
        user_col, F.date_trunc("week", F.col("__first")).alias("cohort_week")
    )
    active = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("__week")
    )
    return (
        active.join(cohorts, user_col)
        .select(
            "cohort_week",
            (
                F.datediff(F.to_date("__week"), F.to_date("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def hourly_anomalies(
    events: DataFrame,
    z_threshold: float = 2.0,
    lookback: int = 24,
    min_history: int = 12,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Hours whose event count deviates from the trailing baseline:
    per-type hourly counts, rolling mean/variance over the preceding
    ``lookback`` hours, emit hours with |z| >= ``z_threshold``.

    Numeric discipline: the rolling window aggregates INTEGER counts
    (sum, sum-of-squares, n — all exact), and mean/var/z evaluate once
    per row from those integers, so the result is deterministic and
    SQL-reproducible — a rolling ``stddev`` window would accumulate
    floats in frame order.

    Headroom (r10 q227-class audit): an hourly count is row-count
    dependent, so the sum-of-squares forms DECIMAL(19,0)×DECIMAL(19,0)
    per-row products summed in DECIMAL(38,0) — exact for ANY long
    hourly count (n² ≤ 8.5e37, × a 10^2-row frame ≪ 1e38).  The
    former long Σn² raised ANSI overflow once a single hour held
    ≥ 3.04e9 events (per-row n·n) or the frame total crossed 2^63 —
    reachable for a hot event type at 100 TB.  The plain sum s stays
    long (≤ frame·n, loud on overflow); s² is formed in double from
    a value < 2^53 in any realistic frame, identically on both
    engines.

    Scale: one groupBy to the hourly grid (O(types × hours) rows —
    tiny), then one window partitioned by type.  The raw event stream
    is touched once; everything after the first aggregate is
    grid-sized.
    """
    hourly = events.groupBy(
        F.col(type_col).alias("etype"),
        F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("etype")
        .orderBy("bucket")
        .rowsBetween(-lookback, -1)
    )
    stats = hourly.select(
        "etype",
        "bucket",
        "n",
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n").cast("decimal(19,0)") * F.col("n").cast("decimal(19,0)"))
        .over(w)
        .alias("ss"),
        F.count("n").over(w).alias("m"),
    ).filter(F.col("m") >= min_history)
    mean = F.col("s").cast("double") / F.col("m")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("m")
    ) / (F.col("m") - 1)
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        stats.filter(var > 0)
        .select(
            "etype",
            "bucket",
            "n",
            (bfround(z, 6) + F.lit(0.0)).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= z_threshold)
    )


def consecutive_paths(
    events: DataFrame, gap_minutes: int = 30, length: int = 3
) -> DataFrame:
    """Frequency of length-``length`` consecutive event-type paths
    within a session (consecutive events <= ``gap_minutes`` apart).

    A path-analysis query normally written as "sessionize, then window
    over (user, session)" — two exchanges, because the session id is
    derived.  This uses the identity that a run of consecutive events
    lies within one gap-session iff EVERY consecutive gap inside the
    run is under the threshold, so one ``partitionBy(user)`` window
    (lead over type and ts) replaces sessionize-then-window: single
    shuffle, and the output is bounded by |event_type|^length.
    Ordering is (ts, event_id) — the repo-wide deterministic tie-break.
    """
    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cols = {"e0": F.col("event_type"), "t0": F.unix_micros(F.col("ts"))}
    for i in range(1, length):
        cols[f"e{i}"] = F.lead("event_type", i).over(w)
        cols[f"t{i}"] = F.unix_micros(F.lead("ts", i).over(w))
    runs = events.select([v.alias(k) for k, v in cols.items()])
    in_session = F.lit(True)
    for i in range(1, length):
        in_session = in_session & (
            (F.col(f"t{i}") - F.col(f"t{i-1}")) <= F.lit(gap_us)
        )
    return (
        runs.filter(F.col(f"e{length-1}").isNotNull())
        .filter(in_session)
        .groupBy(*[f"e{i}" for i in range(length)])
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    window_minutes: int = 7 * 24 * 60,
) -> DataFrame:
    """Attribute each conversion's value to the most recent preceding
    NON-conversion event within the attribution window, per user;
    conversions with no qualifying touch attribute to 'none'.  Output:
    (touch_type, n_conversions, value_cents).

    Two IGNORE-NULLS last() windows (touch type and touch ts) over ONE
    user partitioning — they share the frame and ordering, so they pick
    the same row and Catalyst plans one exchange + one Window operator.
    Value is exact cents; the final aggregate is integer.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != conversion_type, F.col("event_type"))
    touch_ts = F.when(
        F.col("event_type") != conversion_type, F.unix_micros(F.col("ts"))
    )
    gap_us = window_minutes * 60_000_000
    tagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        bfround(F.col("value") * 100).cast("long").alias("cents"),
        F.last(touch, ignorenulls=True).over(w).alias("src"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("src_us"),
    ).filter(F.col("event_type") == conversion_type)
    attributed = tagged.select(
        F.when(
            F.col("src_us").isNotNull()
            & ((F.unix_micros(F.col("ts")) - F.col("src_us")) <= gap_us),
            F.col("src"),
        )
        .otherwise(F.lit("none"))
        .alias("touch_type"),
        "cents",
    )
    return attributed.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.sum("cents").cast("long").alias("value_cents"),
    )
