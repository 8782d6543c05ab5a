"""Tests for the m55 segmentation wave: RFM partition properties and
ABC threshold semantics on crafted revenue ladders."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_rfm_partitions_customers(spark):
    import lawfirm_data_pipeline_spark.oracle.m55_segmentation as m

    rows = m.q215_rfm_segments(spark, SF).collect()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r"] <= 5 and 1 <= r["f"] <= 5 and 1 <= r["m"] <= 5


def test_abc_covers_all_parts_and_ordering(spark):
    import lawfirm_data_pipeline_spark.oracle.m55_segmentation as m

    out = {r["cls"]: r for r in m.q216_abc_classification(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in out.values()) == n_parts
    assert abs(sum(r["revenue_share"] for r in out.values()) - 1.0) < 1e-4
    # A parts out-earn B out-earn C on average (the Pareto ordering)
    def avg(cls):
        return out[cls]["revenue_cents"] / out[cls]["n_parts"] if cls in out else 0.0

    if "A" in out and "B" in out:
        assert avg("A") > avg("B")
    if "B" in out and "C" in out:
        assert avg("B") > avg("C")


def test_abc_thresholds_crafted_ladder(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m55_segmentation as m

    # revenues 50, 30, 15, 5 (total 100): cum 50(A), 80(B... wait:
    # 10*50<=700 A; 10*80>700, <=900 B; 10*95>900 C; 10*100 C
    fake = spark.createDataFrame(
        [(1, 0.50), (1, None), (2, 0.30), (3, 0.15), (4, 0.05)],
        "l_partkey long, l_extendedprice double",
    ).filter(F.col("l_extendedprice").isNotNull())
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: fake)
    out = {r["cls"]: r for r in m.q216_abc_classification(spark, "unused").collect()}
    assert out["A"]["n_parts"] == 1 and out["A"]["revenue_cents"] == 50
    assert out["B"]["n_parts"] == 1 and out["B"]["revenue_cents"] == 30
    assert out["C"]["n_parts"] == 2 and out["C"]["revenue_cents"] == 20
