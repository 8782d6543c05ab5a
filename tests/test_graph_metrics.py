"""Property tests for whole-graph analytics (operators/graph_metrics).

The differential oracle (test_oracle_queries) checks the co-purchase
queries end to end; these tests pin the operator semantics on graphs
with hand-computable answers, where a regression is attributable to a
specific algebraic step rather than "the hash changed".
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.graph_metrics import (
    PAGERANK_SCALE,
    degree_histogram,
    pagerank_fixed,
    triangle_counts,
    undirect,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "src long, dst long, weight long"
    )


# K4 on {1,2,3,4} plus a pendant 5-1: K4 has 4 triangles, each K4 node
# sits in exactly 3 of them, the pendant in none.
_K4_PENDANT = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]


def test_triangle_counts_k4_pendant(spark):
    out = triangle_counts(_edges(spark, _K4_PENDANT))
    got = {r["node"]: r["n_triangles"] for r in out.collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_skew_star_is_triangle_free(spark):
    # a hub star has no triangles; degree orientation must not invent
    # wedge closures out of the hub's out-edges.
    star = [(100, i) for i in range(1, 30)]
    assert triangle_counts(_edges(spark, star)).count() == 0


def test_degree_histogram_k4_pendant(spark):
    got = {
        r["degree"]: r["n_nodes"]
        for r in degree_histogram(_edges(spark, _K4_PENDANT)).collect()
    }
    # node 1 has degree 4, nodes 2-4 degree 3, node 5 degree 1
    assert got == {4: 1, 3: 3, 1: 1}


def test_pagerank_uniform_on_vertex_transitive_graph(spark):
    # a cycle is vertex-transitive: every node must end with the exact
    # same fixed-point rank, and total mass stays within truncation
    # loss of the initial mass.
    n = 8
    cycle = [(i, (i + 1) % n) for i in range(n)]
    rows = pagerank_fixed(_edges(spark, cycle), iters=3).collect()
    fps = {r["rank_fp"] for r in rows}
    assert len(rows) == n and len(fps) == 1
    total = sum(r["rank_fp"] for r in rows)
    # each of 3 rounds loses < 100 pico-units per node to the two
    # integer divisions; initial unit split loses < n.
    assert 0 <= PAGERANK_SCALE - total < n * 400


def test_pagerank_degree_monotone_on_star(spark):
    # hub of a star must out-rank every leaf, and all leaves tie.
    star = [(0, i) for i in range(1, 6)]
    rows = pagerank_fixed(_edges(spark, star), iters=3).collect()
    by_node = {r["node"]: r["rank_fp"] for r in rows}
    leaf_ranks = {v for k, v in by_node.items() if k != 0}
    assert len(leaf_ranks) == 1
    assert by_node[0] > leaf_ranks.pop()


def test_undirect_single_evaluation_shape(spark):
    und = undirect(_edges(spark, [(1, 2), (2, 3)]))
    assert und.count() == 4
    # one Generate over one edge scan, not a union of two scans
    plan = und._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1
