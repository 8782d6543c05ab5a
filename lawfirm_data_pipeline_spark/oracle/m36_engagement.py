"""M36 — recency-weighted engagement and active-user ratios (round 3,
nineteenth wave).

q167 scores users by exponentially time-decayed spend (the
recency-weighted LTV a ranking model consumes) — per-row exp() snapped
to fixed point before the integer sum, the repo's float-with-integer-
spine rule; q168 is the DAU/WAU stickiness series, with the rolling
7-day distinct-user count computed by a bounded grid join instead of
an (unsupported) DISTINCT window.

Registered after m35 — outside round 3's 50-query window; round-4
rotation: m18+ register first (see m18's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..queries import query
from lawfirm_data_pipeline_spark.functions.rounding import bfround

# decay: half-life 7 days -> lambda = ln(2) / 7 per day; reference
# point is the fixed end of the generated month (identical constants
# on both sides)
_REF = "2024-02-01"
_LAMBDA = 0.0990210257942779  # ln(2)/7


# -- q167: exponentially decayed engagement score per user
@query(
    "q167_decayed_engagement",
    f"""
    WITH t AS (SELECT user_id,
                      CAST(CASE WHEN isnan(CAST((value * 100) AS DOUBLE)) OR abs(CAST((value * 100) AS DOUBLE)) >= 9007199254740992.0 THEN CAST((value * 100) AS DOUBLE) ELSE floor(CAST((value * 100) AS DOUBLE) * 1e0 + 0.5) / 1e0 END AS BIGINT) AS cents,
                      (epoch_us(TIMESTAMP '{_REF}') - epoch_us(ts))
                        / 86400000000.0 AS age_days
               FROM events WHERE event_type = 'purchase'),
         s AS (SELECT user_id,
                      CAST(CASE WHEN isnan(CAST((cents * exp(-{_LAMBDA} * age_days) * 1000000.0) AS DOUBLE)) OR abs(CAST((cents * exp(-{_LAMBDA} * age_days) * 1000000.0) AS DOUBLE)) >= 9007199254740992.0 THEN CAST((cents * exp(-{_LAMBDA} * age_days) * 1000000.0) AS DOUBLE) ELSE floor(CAST((cents * exp(-{_LAMBDA} * age_days) * 1000000.0) AS DOUBLE) * 1e0 + 0.5) / 1e0 END
                           AS BIGINT) AS fp,
                      cents
               FROM t)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS raw_cents,
           CASE WHEN isnan(CAST((CAST(sum(fp) AS DOUBLE) / 1000000.0 / 100.0) AS DOUBLE)) OR abs(CAST((CAST(sum(fp) AS DOUBLE) / 1000000.0 / 100.0) AS DOUBLE)) >= 900719925474.0992 THEN CAST((CAST(sum(fp) AS DOUBLE) / 1000000.0 / 100.0) AS DOUBLE) ELSE floor(CAST((CAST(sum(fp) AS DOUBLE) / 1000000.0 / 100.0) AS DOUBLE) * 1e4 + 0.5) / 1e4 END AS decayed_value
    FROM s GROUP BY 1
    """,
)
def q167_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-7-day decayed purchase value per user: age and exp()
    are identical IEEE steps per row, snapped to micro fixed point
    BEFORE the sum — so the distributed aggregate matches the oracle
    bit-for-bit, which a raw float sum never would."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    age_days = (
        F.unix_micros(F.lit(_REF).cast("timestamp")) - F.unix_micros(F.col("ts"))
    ) / 86400000000.0
    cents = bfround(F.col("value") * 100).cast("long")
    fp = bfround(cents * F.exp(F.lit(-_LAMBDA) * age_days) * 1000000.0).cast("long")
    s = events.select("user_id", cents.alias("cents"), fp.alias("fp"))
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("cents").cast("long").alias("raw_cents"),
        bfround(F.sum("fp").cast("double") / 1000000.0 / 100.0, 4).alias(
            "decayed_value"
        ),
    )


# -- q168: DAU / trailing-7-day WAU stickiness
@query(
    "q168_stickiness",
    """
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
         days AS (SELECT DISTINCT d FROM du),
         dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1),
         wau AS (SELECT days.d, CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
                 FROM days JOIN du
                   ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
                 GROUP BY 1)
    SELECT CAST(dau.d AS TIMESTAMP) AS day, dau.dau, wau.wau,
           CASE WHEN isnan(CAST((CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)) AS DOUBLE)) OR abs(CAST((CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)) AS DOUBLE)) >= 9007199254.740992 THEN CAST((CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)) AS DOUBLE) ELSE floor(CAST((CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)) AS DOUBLE) * 1e6 + 0.5) / 1e6 END
             AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    WHERE dau.d >= (SELECT min(d) FROM days) + INTERVAL 6 DAY
    """,
)
def q168_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU over trailing-7-day WAU per day: the rolling DISTINCT is a
    grid join of the |days| calendar against the (day, user) daily-
    active pairs — each pair lands in <= 7 windows, so the join is
    7x|pairs| rows, combinable, and needs no distinct-over-window
    support.  Warm-up days (incomplete trailing week) are excluded."""
    events = load_table(spark, sf_dir, "events")
    # the (day, user) distinct pairs are the compressed activity table
    # (orders smaller than events) and feed four consumers — cached, the
    # events scan + distinct shuffle run once (round-6 census: 4x)
    du = events.select(F.to_date("ts").alias("d"), "user_id").distinct().cache()
    days = du.select("d").distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    j = days.alias("g").join(
        du.alias("p"),
        (F.col("p.d") >= F.date_sub(F.col("g.d"), 6)) & (F.col("p.d") <= F.col("g.d")),
    )
    wau = j.groupBy(F.col("g.d").alias("d")).agg(
        F.count_distinct(F.col("p.user_id")).cast("long").alias("wau")
    )
    start = days.agg(F.date_add(F.min("d"), 6).alias("s"))
    return (
        dau.join(wau, "d")
        .crossJoin(F.broadcast(start))
        .filter(F.col("d") >= F.col("s"))
        .select(
            F.col("d").cast("timestamp").alias("day"),
            "dau",
            "wau",
            bfround(F.col("dau").cast("double") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
    )
