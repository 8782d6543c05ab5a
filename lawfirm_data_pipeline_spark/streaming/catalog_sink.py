"""Exactly-once streaming sink into the transactional catalog.

``foreachBatch`` gives at-least-once micro-batch delivery: a crashed
commit can replay the same (batch_df, batch_id).  The standard fix —
what Delta's idempotent ``txnAppId``/``txnVersion`` writes implement —
is to record the last committed batch id IN THE SAME TRANSACTION as
the data, so replayed batches are recognized and skipped atomically.
This module does exactly that over ``sources.lake.Catalog``: the
running totals table and the ``_meta`` batch-id table stage and commit
together, so there is no state where data landed but the batch id
didn't (or vice versa).

Scale posture: per micro-batch the work is one combinable aggregate of
the batch + one bounded merge against the totals table + a
constant-size commit file; replay detection reads one row of _meta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import Catalog


def exactly_once_totals_sink(spark: SparkSession, catalog: Catalog):
    """Returns a ``foreachBatch``-compatible fn maintaining per-user
    (n_events, total_cents) in catalog table ``totals``; replayed
    batch ids are skipped idempotently via the co-committed ``_meta``
    table."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        txn = catalog.transaction()
        _, tables = catalog.snapshot()
        if "_meta" in tables:
            done = {
                r["batch_id"] for r in txn.read(spark, "_meta").collect()
            }
            if batch_id in done:
                return  # replayed batch: already committed atomically
        agg = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        if "totals" in tables:
            merged = (
                txn.read(spark, "totals")
                .unionByName(agg)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").cast("long").alias("n_events"),
                    F.sum("total_cents").cast("long").alias("total_cents"),
                )
            )
            meta = txn.read(spark, "_meta").unionByName(
                spark.createDataFrame([(batch_id,)], "batch_id long")
            )
        else:
            merged = agg
            meta = spark.createDataFrame([(batch_id,)], "batch_id long")
        txn.stage("totals", merged)
        txn.stage("_meta", meta)
        txn.commit()

    return sink
