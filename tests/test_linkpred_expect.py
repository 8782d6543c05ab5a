"""Tests for the m54 wave: link-prediction Jaccard on a known graph
and expectations-report teeth on planted violations."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_link_prediction_known_graph(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m54_linkpred_expect as m

    # triangle 1-2-3 plus pendant 4 on 1: candidates (2,3) share
    # neighbor 1 AND are linked; (1,4) linked; (2,4)/(3,4) share 1
    fake_li = spark.createDataFrame(
        # one order per edge materializes exactly that co-purchase edge
        [(100, 1), (100, 2), (101, 2), (101, 3), (102, 1), (102, 3), (103, 1), (103, 4)],
        "l_orderkey long, l_partkey long",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: fake_li)
    rows = {(r["x"], r["y"]): r for r in m.q213_link_prediction(spark, "unused").collect()}
    # N(1)={2,3,4}, N(2)={1,3}, N(3)={1,2}, N(4)={1}
    # pair (2,3): cn={1}, union=|{1,3}|+|{1,2}|-1=3 -> j=1/3, linked
    assert rows[(2, 3)]["cn"] == 1 and rows[(2, 3)]["already_linked"]
    assert abs(rows[(2, 3)]["jaccard"] - round(1 / 3, 6)) < 1e-9
    # pair (2,4): cn={1}, union=2+1-1=2 -> j=0.5, NOT linked
    assert rows[(2, 4)]["cn"] == 1 and not rows[(2, 4)]["already_linked"]
    assert abs(rows[(2, 4)]["jaccard"] - 0.5) < 1e-9


def test_expectations_all_pass_on_driver_data(spark):
    import lawfirm_data_pipeline_spark.oracle.m54_linkpred_expect as m

    rows = m.q214_expectations(spark, SF).collect()
    assert len(rows) == 6
    assert all(r["passed"] and r["fails"] == 0 for r in rows)


def test_expectations_catch_planted_violations(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m54_linkpred_expect as m

    good = spark.read.parquet(f"{SF}/orders.parquet")
    bad = spark.createDataFrame(
        [
            # duplicate key + negative price + bogus status
            (1, 1, "X", -5.0, "2024-01-01 00:00:00", "1-URGENT"),
            (1, 1, "F", 10.0, "2024-01-01 00:00:00", "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    planted = good.select(bad.columns).unionByName(bad)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: planted)
    rows = {r["check_name"]: r for r in m.q214_expectations(spark, "unused").collect()}
    assert rows["totalprice_positive"]["fails"] == 1
    assert rows["status_in_domain"]["fails"] == 1
    assert rows["orderkey_unique"]["fails"] == 1  # one duplicated key
    assert not rows["orderkey_unique"]["passed"]
    assert rows["orderkey_not_null"]["passed"]
