"""Bucketed co-located joins: same result as plain join, and the plan
has no shuffle Exchange on the bucketed sides."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.operators.bucketing import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF, "orders").withColumnRenamed("o_custkey", "custkey")
    customer = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "custkey")
    write_bucketed(orders, "orders_b", "custkey", n_buckets=8)
    write_bucketed(customer, "customer_b", "custkey", n_buckets=8)
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force the SMJ path: broadcast would hide the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, lt, rt, on="custkey")
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    orders = load_table(spark, SF, "orders").withColumnRenamed("o_custkey", "custkey")
    customer = load_table(spark, SF, "customer").withColumnRenamed("c_custkey", "custkey")
    plain = orders.join(customer, on="custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    )
    bucketed = bucketed_join(spark, lt, rt, on="custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    )
    p, b = plain.first(), bucketed.first()
    assert p.n == b.n and abs(p.s - b.s) < 1e-6 * abs(p.s)


def test_stale_bucket_dir_sweep(spark, tmp_path, monkeypatch):
    """r7 ADVICE: per-session table tags made b_orders_*/b_lineitem_*
    warehouse dirs from crashed sessions accumulate forever (app ids
    never repeat, so the same-tag reclaim was unreachable).  The
    age-based sweep removes dirs older than a day and leaves young
    ones (possibly a live concurrent session) untouched."""
    import os
    import time

    from lawfirm_data_pipeline_spark.oracle import m87_tokenize_bucket_split as m87

    old = tmp_path / "b_orders_deadbeef"
    young = tmp_path / "b_lineitem_cafe0123"
    other = tmp_path / "not_a_bucket_dir"
    for d in (old, young, other):
        d.mkdir()
        (d / "part-0.parquet").write_bytes(b"x")
    stale = time.time() - m87._STALE_BUCKET_DIR_SECONDS - 60
    os.utime(old, (stale, stale))
    os.utime(other, (stale, stale))

    class _Conf:
        def get(self, k, default=None):
            return str(tmp_path)

    class _FakeContext:
        applicationId = "fake-app-no-cache-entries"

    class _FakeSpark:
        conf = _Conf()
        sparkContext = _FakeContext()

    m87._sweep_stale_bucket_dirs(_FakeSpark())
    assert not old.exists(), "day-old bucket dir must be reclaimed"
    assert young.exists(), "young dir may belong to a live session"
    assert other.exists(), "sweep must only touch b_orders_/b_lineitem_ dirs"
