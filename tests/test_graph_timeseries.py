"""Unit tests for connected components and resample/gap-fill (M12)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.graph import (
    connected_components,
    neardup_cluster_summary,
)
from lawfirm_data_pipeline_spark.operators.timeseries import resample_ffill


def test_cc_chain_and_singleton(spark):
    """A 4-node chain needs multiple propagation rounds to collapse to
    the min label; an isolated node stays a singleton."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], "ida bigint, idb bigint"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 7, 8, 9)], "id bigint")
    got = {
        (r.node, r.cluster_id)
        for r in connected_components(pairs, nodes=nodes).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (7, 7), (8, 7), (9, 9)}


def test_cc_summary(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "ida bigint, idb bigint")
    members = connected_components(pairs)
    summary = {
        (r.cluster_id, r.n_members, r.canonical_id)
        for r in neardup_cluster_summary(members).collect()
    }
    assert summary == {(1, 3, 1)}


def test_resample_fills_gaps(spark):
    """Observations at hours 0 and 3 → grid rows for hours 1-2 are
    synthesized, carry hour-0's sum forward, and are flagged as gaps."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1.5),
        (1, base + dt.timedelta(minutes=30), 2.0),
        (1, base + dt.timedelta(hours=3), 4.0),
    ]
    events = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    out = {
        r.bucket.hour: (r.n, r.sum_micros, r.filled_micros, r.is_gap)
        for r in resample_ffill(events).collect()
    }
    assert out == {
        0: (2, 3_500_000, 3_500_000, False),
        1: (0, None, 3_500_000, True),
        2: (0, None, 3_500_000, True),
        3: (1, 4_000_000, 4_000_000, False),
    }


def test_resample_partial_agg_before_shuffle(spark):
    """The bucket aggregate must show a partial (map-side) HashAggregate
    below the exchange — the property that keeps the shuffle sized by
    the grid, not the event count, at 100 TB."""
    events = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], "user_id bigint, ts timestamp, value double"
    )
    plan = resample_ffill(events)._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "partial_count" in plan
