"""A23/A24/A27 metrics & guards: accumulator counters from executor
tasks, linear histogram vs hand-computed buckets, per-item timeout,
partition-count concurrency gate, streaming progress listener."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.pipeline.metrics import (
    BatchProgressReporter,
    StageCounters,
    concurrency_gate,
    duration_histogram,
    with_timeout,
)

SF = "/root/testdata/sf0.01"


def test_counters_accumulate_from_executor_tasks(spark):
    counters = StageCounters.create(spark)
    df = spark.range(100).repartition(8)

    def sink(rows):
        for r in rows:
            if r.id % 10 == 0:
                counters.failed.add(1)
            else:
                counters.processed.add(1)

    df.foreachPartition(sink)
    snap = counters.snapshot()
    assert snap["processed"] == 90 and snap["failed"] == 10
    assert counters.success_rate() == 90.0


def test_duration_histogram_matches_linear_buckets(spark):
    durations = spark.createDataFrame(
        [(0,), (999,), (1000,), (5500,), (9999,), (25000,)], "duration_ms long"
    )
    out = {r.bucket: r.n for r in duration_histogram(durations, bucket_width_ms=1000).collect()}
    # 0,999 -> b0; 1000 -> b1; 5500 -> b5; 9999 & 25000 (overflow clamp) -> b9
    assert out == {0: 2, 1: 1, 5: 1, 9: 2}


def test_with_timeout_bumps_counter_and_returns_none(spark):
    counters = StageCounters.create(spark)

    def slow(x):
        time.sleep(2)
        return x

    guarded = with_timeout(slow, timeout_s=0.2, counters=counters)
    assert guarded(1) is None
    assert counters.timed_out.value == 1
    fast = with_timeout(lambda x: x + 1, timeout_s=5)
    assert fast(1) == 2


def test_concurrency_gate_caps_partitions(spark):
    df = load_table(spark, SF, "orders")
    assert concurrency_gate(df, 10).rdd.getNumPartitions() <= 10


def test_streaming_listener_records_progress(spark):
    from lawfirm_data_pipeline_spark.io import load_events_stream

    rep = BatchProgressReporter.attach(spark)
    try:
        q = (
            load_events_stream(spark, SF)
            .groupBy("event_type")
            .count()
            .writeStream.format("memory")
            .queryName("listener_probe")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        # listener events are async; give the bus a moment
        deadline = time.time() + 15
        while time.time() < deadline and not any(
            v["rows"] > 0 for v in rep.latest.values()
        ):
            time.sleep(0.5)
        assert any(v["rows"] > 0 for v in rep.latest.values())
    finally:
        rep.detach(spark)
