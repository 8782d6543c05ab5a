"""Regressions for the three value defects the r9 sf3 differential
caught (beyond q227's overflow, pinned in test_cuped_overflow.py):

* q07 — ``sum(double)`` over a money column drifts in its last ulp
  with addend order once a group holds sf3-many rows; the Prisma
  ``_sum``/``_avg`` machinery now snaps float columns to
  DECIMAL(30,6) before aggregating (query._sum_exact).
* q15 — ``round(double * 1.1, 2)`` rounds knife-edge products
  differently across engines (Spark rounds the shortest decimal
  repr, DuckDB the binary value); the money bump is now exact
  DECIMAL(18,2) * 1.1 with a HALF_UP round.
* q99 — a tiny NEGATIVE exact sum rounds to -0.0 in DuckDB but +0.0
  in Spark; centroids normalize negative zero on both sides.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from pyspark.sql import functions as F


def test_float_sum_is_exact_and_partition_independent(spark):
    """_sum over doubles equals the exact decimal sum (computed with
    Python Decimals) and is bit-identical across partitionings —
    naive sum(double) holds neither property at scale."""
    from lawfirm_data_pipeline_spark.query import Model

    # 2dp money values whose double sum is ulp-sensitive to order:
    # large alternating magnitudes.
    vals = [round((-1) ** i * (10**9 + i * 997) / 100 + 0.07, 2) for i in range(4000)]
    exact = float(sum(Decimal(str(v)) for v in vals))
    got = {}
    for parts in (1, 7, 32):
        df = spark.createDataFrame([(v,) for v in vals], "price double").repartition(
            parts
        )
        row = Model(df, "t").aggregate(_sum={"price": True}).collect()[0]
        got[parts] = row["sum_price"]
    assert len(set(got.values())) == 1, f"partition-dependent sums: {got}"
    assert got[1] == exact


def test_float_avg_matches_exact_sum_over_count(spark):
    from lawfirm_data_pipeline_spark.query import Model

    vals = [round(1000.0 + i * 0.01, 2) for i in range(999)] + [None]
    df = spark.createDataFrame([(v,) for v in vals], "price double")
    row = Model(df, "t").aggregate(_avg={"price": True}).collect()[0]
    exact = float(sum(Decimal(str(v)) for v in vals if v is not None)) / 999
    assert row["avg_price"] == pytest.approx(exact, abs=1e-9)


def test_money_bump_rounds_knife_edge_like_decimal(spark):
    """286824.35 * 1.1 = 315506.785 exactly in decimal, but the double
    product sits below the .785 midpoint — binary rounding gives .78,
    decimal HALF_UP gives .79.  The engine must give the decimal
    answer (and so must the q15 oracle, changed in the same commit)."""
    base = 286824.35
    # Prove this IS a knife-edge: the double product rounds DOWN under
    # round-binary-half-even but the exact decimal rounds UP.
    dec = (Decimal(str(base)) * Decimal("1.1")).quantize(
        Decimal("0.01"), rounding=ROUND_HALF_UP
    )
    assert float(dec) == 315506.79 and round(base * 1.1, 2) == 315506.78
    df = spark.createDataFrame([(base,)], "o_totalprice double")
    got = df.select(
        F.round(F.col("o_totalprice").cast("decimal(18,2)") * F.expr("1.1BD"), 2)
        .cast("double")
        .alias("bumped")
    ).collect()[0]["bumped"]
    assert got == 315506.79


def test_label_centroids_normalize_negative_zero(spark):
    from lawfirm_data_pipeline_spark.operators.similarity import label_centroids

    # Two vectors whose dim-0 sums to a tiny NEGATIVE number: the
    # centroid rounds to zero and must come out +0.0, not -0.0.
    rows = [("a", [1e-9, 1.0]), ("a", [-3e-9, 1.0])]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    out = {
        r["pos"]: r["centroid"] for r in label_centroids(df).collect()
    }
    assert out[0] == 0.0
    assert math.copysign(1.0, out[0]) == 1.0, "centroid leaked -0.0"
    assert out[1] == 1.0


def test_q01_flagship_sums_are_exact_decimal(spark):
    """r10 fresh-draw differential finding: the flagship's former
    sum(double) drifted in its last ulp at 6M fresh rows.  Pin the
    exact-decimal rewrite: a 3-row group whose double sum is
    famously inexact must come out exact."""
    from pyspark.sql import Row

    from lawfirm_data_pipeline_spark.plans.pricing_summary import pricing_summary

    import lawfirm_data_pipeline_spark.plans.pricing_summary as mod

    rows = [
        Row(
            l_orderkey=i, l_partkey=0, l_suppkey=0, l_linenumber=1,
            l_quantity=1.0, l_extendedprice=p, l_discount=0.0, l_tax=0.0,
            l_returnflag="A", l_linestatus="F",
            l_shipdate=__import__("datetime").datetime(1995, 1, 1),
        )
        for i, p in enumerate([0.10, 0.10, 0.10])
    ]
    df = spark.createDataFrame(rows)
    orig = mod.load_table
    mod.load_table = lambda sp, sf, name: df
    try:
        out = pricing_summary(spark, "unused").collect()[0]
    finally:
        mod.load_table = orig
    # plain double sum of 0.1*3 is 0.30000000000000004; decimal is 0.3
    assert out["sum_base_price"] == 0.3
    assert out["avg_price"] == 0.3 / 3


def test_binary_floor_rounding_ties_are_engine_stable(spark):
    """r10 fresh-draw findings: engine round(x, 6) splits on decimal-
    half ties (q144 percentile midpoints, q266 LOO quotients).  The
    binary-floor form floor(x*1e6 + 0.5)/1e6 is the same IEEE ops on
    the same double everywhere.  Pin a .5-microsecond percentile
    midpoint: two converters 1us apart make p50 end in .5."""
    import datetime

    from pyspark.sql import Row

    import lawfirm_data_pipeline_spark.oracle.m29_mlops_market as m

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for uid, lag_us in ((1, 1_000_000), (2, 1_000_001)):
        rows.append(Row(event_id=uid * 10, ts=base, user_id=uid,
                        event_type="signup", value=0.0, props="{}"))
        rows.append(Row(event_id=uid * 10 + 1,
                        ts=base + datetime.timedelta(microseconds=lag_us),
                        user_id=uid, event_type="purchase", value=1.0,
                        props="{}"))
    df = spark.createDataFrame(rows)
    orig = m.load_table
    m.load_table = lambda sp, sf, name: df
    try:
        out = m.q144_time_to_convert(spark, "unused").collect()[0]
    finally:
        m.load_table = orig
    # p50 = 1000000.5 us = 1.0000005 s -> half-up at 6dp -> 1.000001
    assert out["n_converted"] == 2
    assert out["p50_sec"] == 1.000001
