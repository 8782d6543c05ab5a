"""M72 — round-4 wave 12: lake/streaming integration — dynamic
partition overwrite + exactly-once streaming sink through the
transactional catalog.

q256 is the backfill primitive: overwrite ONE day of a
day-partitioned table (dynamic partition overwrite) and prove every
other day's bytes are untouched.  q257 closes the streaming→lake
loop: a real stream drains through ``foreachBatch`` into the m61
Catalog with batch-id idempotence recorded IN the same transaction —
then one batch is deliberately REPLAYED, and the totals must still
equal a single batch pass (the at-least-once → exactly-once upgrade
every production sink needs).

Registered after m71 — outside the round-4 driver window; first
driver rows with the round-5 rotation.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..queries import query
from ..sources.lake import Catalog
from ..streaming.catalog_sink import exactly_once_totals_sink
from lawfirm_data_pipeline_spark.functions.rounding import bfround

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_TMP_ROOT = os.path.join(_REPO, ".tmp_lake")

_BACKFILL_DAY = "2024-01-15"


# -- q256: dynamic partition overwrite (single-day backfill)
@query(
    "q256_dynamic_partition_overwrite",
    f"""
    WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                      CASE WHEN CAST(date_trunc('day', ts) AS DATE)
                                = DATE '{_BACKFILL_DAY}'
                           THEN 2 * CAST(CASE WHEN isnan(CAST((value * 100) AS DOUBLE)) OR abs(CAST((value * 100) AS DOUBLE)) >= 9007199254740992.0 THEN CAST((value * 100) AS DOUBLE) ELSE floor(CAST((value * 100) AS DOUBLE) * 1e0 + 0.5) / 1e0 END AS BIGINT)
                           ELSE CAST(CASE WHEN isnan(CAST((value * 100) AS DOUBLE)) OR abs(CAST((value * 100) AS DOUBLE)) >= 9007199254740992.0 THEN CAST((value * 100) AS DOUBLE) ELSE floor(CAST((value * 100) AS DOUBLE) * 1e0 + 0.5) / 1e0 END AS BIGINT)
                      END AS cents
               FROM events WHERE user_id % 5 = 0)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM e GROUP BY 1
    """,
)
def q256_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a day-partitioned table, then backfill ONE day (cents
    doubled) with dynamic partition overwrite — only that day's
    directory is rewritten; the per-day readback must show every other
    day byte-identical to the original and the backfilled day changed.
    This is the idempotent-backfill primitive every scheduled pipeline
    re-run depends on."""
    scratch = os.path.join(_TMP_ROOT, f"dpo_{uuid.uuid4().hex}")
    try:
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id") % 5 == 0)
            .select(
                F.to_date(F.date_trunc("day", "ts")).alias("day"),
                bfround(F.col("value") * 100).cast("long").alias("cents"),
            )
        )
        ev.write.partitionBy("day").parquet(scratch)
        backfill = ev.filter(F.col("day") == _BACKFILL_DAY).select(
            "day", (F.col("cents") * 2).alias("cents")
        )
        (
            backfill.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(scratch)
        )
        out = (
            spark.read.parquet(scratch)
            .groupBy("day")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("cents").cast("long").alias("cents"),
            )
            .select(F.col("day").cast("string").alias("day"), "n", "cents")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# -- q257: exactly-once streaming sink through the catalog (+ replay)
@query(
    "q257_stream_catalog_sink",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(CASE WHEN isnan(CAST((value * 100) AS DOUBLE)) OR abs(CAST((value * 100) AS DOUBLE)) >= 9007199254740992.0 THEN CAST((value * 100) AS DOUBLE) ELSE floor(CAST((value * 100) AS DOUBLE) * 1e0 + 0.5) / 1e0 END AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events WHERE user_id % 11 = 0
    GROUP BY 1
    """,
)
def q257_stream_catalog_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real stream drains through foreachBatch into the Catalog; the
    batch id commits ATOMICALLY with the totals (streaming/
    catalog_sink), then the LAST batch is deliberately replayed — the
    idempotence path must skip it, so the final totals equal one batch
    pass exactly.  Double-counting (replay applied) or data loss
    (batch skipped) both flip the hash."""
    from ..io import load_events_stream

    scratch = os.path.join(_TMP_ROOT, f"cds_{uuid.uuid4().hex}")
    try:
        cat = Catalog(scratch)
        sink = exactly_once_totals_sink(spark, cat)
        seen: list = []

        def tracking_sink(df: DataFrame, bid: int) -> None:
            seen.append((df, bid))
            sink(df, bid)

        stream = (
            load_events_stream(spark, sf_dir)
            .filter(F.col("user_id") % 11 == 0)
            .select(
                "user_id", bfround(F.col("value") * 100).cast("long").alias("cents")
            )
        )
        q = (
            stream.writeStream.foreachBatch(tracking_sink)
            .option("checkpointLocation", os.path.join(scratch, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            from ..streaming.plan_capture import capture

            capture(q, "exactly_once_totals")
        finally:
            q.stop()
        # simulate an at-least-once redelivery of the final micro-batch
        if seen:
            df, bid = seen[-1]
            sink(df, bid)
        out = cat.read(spark, "totals")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
