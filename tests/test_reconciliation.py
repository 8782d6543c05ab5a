"""Tests for the m59 reconciliation audit: crafted balanced and broken
books, orphan handling, tolerance boundary."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_reconciliation_crafted_books(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m59_reconciliation as m

    orders = spark.createDataFrame(
        [
            (1, 110.00),   # balances exactly (100 * 1.10)
            (2, 50.00),    # off by 10 cents vs items (49.90)
            (3, 25.00),    # orphan: no items
            (4, 20.01),    # off by exactly 1 cent (tolerance boundary)
        ],
        "o_orderkey long, o_totalprice double",
    )
    items = spark.createDataFrame(
        [
            (1, 100.0, 0.0, 0.10),
            (2, 49.90, 0.0, 0.0),
            (4, 20.00, 0.0, 0.0),
        ],
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    )

    def fake(sp, sf, name, **kw):
        return orders if name == "orders" else items

    monkeypatch.setattr(m, "load_table", fake)
    r = m.q222_order_reconciliation(spark, "unused").collect()[0]
    assert r["n_orders"] == 4
    assert r["n_no_items"] == 1
    assert r["n_reconciled"] == 2  # order 1 (exact) + order 4 (1 cent)
    assert r["max_delta_cents"] == 10


def test_reconciliation_driver_data_shape(spark):
    import lawfirm_data_pipeline_spark.oracle.m59_reconciliation as m

    r = m.q222_order_reconciliation(spark, SF).collect()[0]
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert r["n_orders"] == n_orders
    # the synthetic generator does NOT maintain the invariant — the
    # audit must REPORT that, not hide it
    assert r["n_no_items"] > 0
    assert r["n_reconciled"] == 0
    assert r["max_delta_cents"] > 0
