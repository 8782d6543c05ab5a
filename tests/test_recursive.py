"""Tests for the m50 recursive-CTE surface: known-graph reachability
and agreement with the iterative BFS operator."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_recursive_cte_known_graph(spark):
    # path graph 1-2-3-4-5: from seed 1, depth<=2 reaches {1,2,3}
    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    ).createOrReplaceTempView("m50_e0")
    out = spark.sql(
        """
        WITH RECURSIVE
          edges AS (SELECT src, dst FROM m50_e0
                    UNION ALL SELECT dst, src FROM m50_e0),
          r(seed, node, depth) AS (
            SELECT CAST(s AS BIGINT), CAST(s AS BIGINT), CAST(0 AS BIGINT)
            FROM VALUES (1) AS seeds(s)
            UNION ALL
            SELECT r.seed, e.dst, r.depth + CAST(1 AS BIGINT)
            FROM r JOIN edges e ON e.src = r.node
            WHERE r.depth < 2
          )
        SELECT node, min(depth) AS d FROM r GROUP BY 1
        """
    ).collect()
    got = {r["node"]: r["d"] for r in out}
    assert got == {1: 0, 2: 1, 3: 2}


def test_recursive_matches_iterative_bfs(spark):
    from lawfirm_data_pipeline_spark.operators.graph_metrics import bfs_distances
    from lawfirm_data_pipeline_spark.oracle.m50_recursive import q208_recursive_reach

    rec = q208_recursive_reach(spark, SF)
    # rebuild the same bounded edge set and drive the iterative operator
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    e0 = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .filter((F.col("a.l_partkey") < 80) & (F.col("b.l_partkey") < 80))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    a = {(r["seed"], r["node"]): r["min_depth"] for r in rec.collect()}
    # bfs_distances pools its seed set, so drive it once per seed
    b = {}
    for s in (1, 7, 42):
        seeds = spark.createDataFrame([(s,)], "seed long")
        for r in bfs_distances(e0, seeds, max_hops=2).collect():
            b[(s, r["node"])] = r["dist"]
    assert a == b
