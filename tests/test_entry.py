"""Smoke: the driver contract module loads and entry() returns rows."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "l_linestatus", "sum_qty", "count_order"}


def test_every_query_has_callable_and_names_align(spark):
    import __spark_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    assert qs, "no queries registered"
    assert set(sqls) <= set(qs), "oracle_sql keys must be a subset of queries"
