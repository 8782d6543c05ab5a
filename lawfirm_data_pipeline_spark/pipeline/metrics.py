"""Operational metrics & execution guards (SURVEY.md A23/A24/A27).

The reference's Effect metrics (locator.ts:41-49: processed/failed/
skipped/timedOut counters, a linear duration histogram, a derived
success rate, reported on a timer at locator.ts:210-213) map to:

* **executor-safe counters** — Spark accumulators, incremented inside
  tasks (foreachPartition sinks), readable on the driver;
* **duration histogram** — a DataFrame aggregation (`floor(ms/width)`
  groupBy ≡ ``MetricBoundaries.linear(0, width, 10)``), run on the
  recorded durations rather than mutated in-row;
* **report loop** — a ``StreamingQueryListener``: Spark already emits
  per-batch progress events, so the reference's 30/60 s report timer
  becomes an event subscription, no custom thread.

A23 (per-item timeout: Effect.timeout around each workflow) becomes a
thread-pool timeout wrapping the per-row work inside the sink; A27
(semaphore(10) browser contexts) becomes partition-count gating — Spark
runs one sink invocation per partition, so ``repartition(n)`` IS the
concurrency cap.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import TimeoutError as FutureTimeout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageCounters:
    """Accumulator-backed counters for one pipeline stage (A24).

    Accumulators are the only driver-visible mutable state executors can
    write; counts survive task retries only as over-counts (Spark adds
    re-run increments), matching the reference's at-least-once metric
    semantics under Activity.retry.
    """

    processed: object = field(default=None)
    failed: object = field(default=None)
    skipped: object = field(default=None)
    timed_out: object = field(default=None)

    @classmethod
    def create(cls, spark: SparkSession) -> "StageCounters":
        sc = spark.sparkContext
        return cls(
            processed=sc.accumulator(0),
            failed=sc.accumulator(0),
            skipped=sc.accumulator(0),
            timed_out=sc.accumulator(0),
        )

    def success_rate(self) -> float:
        """locator.ts:192-195: processed / (processed + failed) %."""
        done = self.processed.value
        total = done + self.failed.value
        return round(100.0 * done / total, 2) if total else 0.0

    def snapshot(self) -> dict[str, int]:
        return {
            "processed": self.processed.value,
            "failed": self.failed.value,
            "skipped": self.skipped.value,
            "timed_out": self.timed_out.value,
        }


def duration_histogram(
    durations: DataFrame,
    col: str = "duration_ms",
    bucket_width_ms: int = 1000,
    n_buckets: int = 10,
) -> DataFrame:
    """Linear-bucket histogram ≡ ``MetricBoundaries.linear(0, width, 10)``
    (locator.ts:47-49; scraper uses width 10 s — pass 10000).

    Overflows clamp into the top bucket, like the reference's final
    +Inf boundary.  Returns (bucket, lo_ms, hi_ms, n).
    """
    bucket = F.least(
        F.floor(F.col(col) / bucket_width_ms).cast("int"), F.lit(n_buckets - 1)
    )
    return (
        durations.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * bucket_width_ms).alias("lo_ms"),
            ((F.col("bucket") + 1) * bucket_width_ms).alias("hi_ms"),
            "n",
        )
    )


def with_timeout(fn, timeout_s: float, counters: StageCounters | None = None):
    """A23: per-item timeout around sink work (Effect.timeout analogue).

    Runs ``fn(item)`` in a worker thread; on expiry returns None and
    bumps ``timed_out``.  Use inside foreachPartition bodies — one pool
    per partition, threads bounded by the partition's in-flight item.
    """

    def wrapped(item):
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(fn, item)
            try:
                return fut.result(timeout=timeout_s)
            except FutureTimeout:
                if counters is not None:
                    counters.timed_out.add(1)
                fut.cancel()
                return None

    return wrapped


def concurrency_gate(df: DataFrame, max_concurrent: int = 10) -> DataFrame:
    """A27: the reference's ``Effect.makeSemaphore(10)`` browser-context
    cap.  Spark invokes a sink once per partition concurrently, so
    capping partitions caps concurrent external sessions."""
    return df.coalesce(max_concurrent)


class BatchProgressReporter:
    """A24 report loop: subscribes to streaming progress events and keeps
    the latest per-query stats (the reference logs on a 30/60 s timer;
    Spark pushes an event per micro-batch instead).

    Usage::

        rep = BatchProgressReporter.attach(spark)
        ... run streaming queries ...
        rep.latest  # {query_name: {"batch": n, "rows": m, "sec": s}}
    """

    def __init__(self) -> None:
        self.latest: dict[str, dict] = {}

    @classmethod
    def attach(cls, spark: SparkSession) -> "BatchProgressReporter":
        from pyspark.sql.streaming import StreamingQueryListener

        self = cls()

        class _L(StreamingQueryListener):
            def onQueryStarted(s, event) -> None:  # noqa: N805
                pass

            def onQueryProgress(s, event) -> None:  # noqa: N805
                p = event.progress
                self.latest[p.name or p.id] = {
                    "batch": p.batchId,
                    "rows": p.numInputRows,
                    "sec": (p.batchDuration or 0) / 1000.0,
                    "at": time.time(),
                }

            def onQueryIdle(s, event) -> None:  # noqa: N805
                pass

            def onQueryTerminated(s, event) -> None:  # noqa: N805
                pass

        self._listener = _L()
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self._listener)
