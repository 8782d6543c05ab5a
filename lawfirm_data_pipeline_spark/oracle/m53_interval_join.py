"""M53 — interval-overlap join (round 3 continuation).

q212 joins two INTERVAL sets — gap-sessionized user sessions and a
deterministic promo-window calendar — on time overlap, the classic
"which sessions touched which campaign" question.  Overlap joins are
the canonical non-equi-join scale trap: the naive form is a range
cross product.  The Spark plan uses the same bucketize-then-verify
shape as the bounded range join (operators/temporal.py): both sides
explode to day-grain buckets (a session covers <= a handful of days,
a promo window <= 2), the join is an EQUI join on the bucket, and the
exact overlap predicate verifies candidates after the hash join — no
non-equi join ever reaches the planner.  The oracle states the plain
overlap theta-join, affordable at oracle scale.

Registered after m52 — outside round 3's 50-query window (round-4
rotation note in ``oracle/__init__.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..queries import query

_N_PROMOS = 10

# promo p: starts 2024-01-01 06:00 UTC + 3p days, runs 12 hours
_PROMO_SQL = f"""
    SELECT p,
           TIMESTAMP '2024-01-01 06:00:00' + INTERVAL (3 * p) DAY AS ps,
           TIMESTAMP '2024-01-01 18:00:00' + INTERVAL (3 * p) DAY AS pe
    FROM (SELECT unnest(generate_series(0, {_N_PROMOS - 1})) AS p)
"""

_SESSION_SQL = """
    SELECT user_id, session_idx,
           min(ts) AS s_start,
           max(ts) AS s_end
    FROM (SELECT user_id, ts, event_id,
                 sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM (SELECT user_id, ts, event_id,
                       epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         AS gap_us
                FROM events WHERE user_id % 7 = 0))
    GROUP BY 1, 2
"""


# -- q212: session x promo overlap join, bucketized
@query(
    "q212_interval_join",
    f"""
    WITH promos AS ({_PROMO_SQL}),
         sessions AS ({_SESSION_SQL})
    SELECT promos.p AS promo,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT sessions.user_id) AS BIGINT) AS n_users,
           CAST(sum(epoch_us(least(s_end, pe)) - epoch_us(greatest(s_start, ps)))
                AS BIGINT) AS overlap_us
    FROM sessions JOIN promos
      ON s_start <= pe AND s_end >= ps
    GROUP BY 1
    """,
)
def q212_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per promo window: overlapping sessions, distinct users, and the
    total overlapped microseconds (exact integer sums).  Bucketize →
    equi-join → verify: day buckets bound each candidate list, so join
    cost tracks (intervals x days-per-interval), never |sessions| x
    |promos| — the q52 range-join discipline applied to
    interval-interval overlap."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    tagged = events.withColumn(
        "session_idx",
        F.sum(
            F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sessions = tagged.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    promos = spark.range(_N_PROMOS).select(
        F.col("id").alias("p"),
        (
            F.lit("2024-01-01 06:00:00").cast("timestamp")
            + F.make_interval(days=F.col("id").cast("int") * 3)
        ).alias("ps"),
        (
            F.lit("2024-01-01 18:00:00").cast("timestamp")
            + F.make_interval(days=F.col("id").cast("int") * 3)
        ).alias("pe"),
    )
    sdays = sessions.withColumn(
        "day", F.explode(F.sequence(F.to_date("s_start"), F.to_date("s_end")))
    )
    pdays = promos.withColumn(
        "day", F.explode(F.sequence(F.to_date("ps"), F.to_date("pe")))
    )
    cand = (
        sdays.join(F.broadcast(pdays), "day")
        .filter((F.col("s_start") <= F.col("pe")) & (F.col("s_end") >= F.col("ps")))
        .select("user_id", "session_idx", "p", "s_start", "s_end", "ps", "pe")
        .distinct()
    )
    overlap = F.unix_micros(F.least("s_end", "pe")) - F.unix_micros(
        F.greatest("s_start", "ps")
    )
    return cand.groupBy(F.col("p").alias("promo")).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(overlap).cast("long").alias("overlap_us"),
    )
