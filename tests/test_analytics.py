"""M7 analytics-extension tests: grouping-set totals, sketch error
bounds, TF-IDF ranking sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.oracle.m7_analytics import (
    q41_rollup,
    q42_cube,
    q46_tfidf_topk,
    q50_approx_distinct,
)

SF = "/root/testdata/sf0.01"


def test_rollup_grand_total_matches_base_count(spark):
    out = q41_rollup(spark, SF)
    orders_n = load_table(spark, SF, "orders").count()
    grand = out.filter(F.col("gid") == 3).collect()
    assert len(grand) == 1
    assert grand[0].n_orders == orders_n
    # per-nation subtotals sum to the grand total
    nation_level = out.filter(F.col("gid") == 1)
    assert nation_level.agg(F.sum("n_orders")).first()[0] == orders_n


def test_cube_has_all_four_grouping_levels(spark):
    gids = {r.gid for r in q42_cube(spark, SF).select("gid").distinct().collect()}
    assert gids == {0, 1, 2, 3}


def test_approx_count_distinct_within_rsd(spark):
    out = q50_approx_distinct(spark, SF).collect()
    orders = load_table(spark, SF, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert {r.o_orderpriority for r in out} == set(exact)
    for r in out:
        assert r.exact_custs == exact[r.o_orderpriority]
        assert r.within_tol, f"{r.o_orderpriority}: sketch outside 5% of {r.exact_custs}"


def test_profile_counts_nulls_and_distincts(spark):
    from lawfirm_data_pipeline_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b"), (5, None)], "id int, v string"
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert prof["v"].n_null == 2 and prof["v"].n_distinct == 2
    assert prof["id"].n_rows == 5 and prof["id"].min_value == "1" and prof["id"].max_value == "5"


def test_tfidf_rare_terms_outrank_common(spark):
    out = q46_tfidf_topk(spark, SF)
    # every ranked term has positive tfidf (appears in < all docs)
    assert out.filter(F.col("tfidf") <= 0).count() == 0
    # exactly k rows per doc for docs with >= k distinct terms
    counts = out.groupBy("doc_id").count()
    assert counts.filter(F.col("count") > 3).count() == 0
