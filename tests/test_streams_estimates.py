"""Property tests for the m32 wave: bounded BFS, cardinality
estimates, audience masks."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.graph_metrics import bfs_distances


def _edges(spark, pairs):
    return spark.createDataFrame([(a, b) for a, b in pairs], "src long, dst long")


def test_bfs_distances_path_graph(spark):
    # path 0-1-2-3-4-5: from seed 0, hop cap 3 reaches nodes 0..3 only
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, seeds, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_min_over_multiple_seeds(spark):
    # two seeds; middle node takes the SHORTER distance
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(0,), (4,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, seeds, max_hops=2).collect()}
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_bfs_disconnected_component_excluded(spark):
    edges = _edges(spark, [(0, 1), (10, 11)])
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"] for r in bfs_distances(edges, seeds, max_hops=3).collect()}
    assert got == {0, 1}


def test_join_cardinality_estimate_exact_under_uniformity(spark, monkeypatch):
    # when every key in a bucket has the same multiplicity on both
    # sides, the containment estimate is exact
    import lawfirm_data_pipeline_spark.oracle.m32_streams_estimates as m

    ev = spark.createDataFrame(
        [(u,) for u in range(64) for _ in range(3)], "user_id long"
    )
    od = spark.createDataFrame(
        [(u, u) for u in range(64) for _ in range(2)], "o_orderkey long, o_custkey long"
    )
    monkeypatch.setattr(
        m, "load_table", lambda sp, sf, name, **kw: ev if name == "events" else od
    )
    r = m.q153_join_cardinality(spark, "unused").collect()[0]
    assert r["actual"] == 64 * 3 * 2
    assert r["est_fp"] == r["actual"] * 1_000_000
    assert r["rel_err"] == 0.0
