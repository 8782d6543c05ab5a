"""Property tests for the m28 wave: concurrency sweep, MAD outliers,
chi-square independence, trend slopes."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.stats import (
    chisq_independence,
    mad_outliers,
    trend_slopes,
)
from lawfirm_data_pipeline_spark.operators.timeseries import max_concurrency


def _iv(spark, rows):
    return spark.createDataFrame(rows, "state string, valid_from long, valid_to long")


def test_max_concurrency_counts_touching_intervals(spark):
    rows = [
        ("a", 0, 10), ("a", 10, 20),  # touch at 10 -> concurrent (peak 2)
        ("a", 30, 40),
        ("b", 0, 5), ("b", 1, 6), ("b", 2, 7),  # triple overlap -> 3
        ("c", 0, 0),  # degenerate point interval -> 1
    ]
    got = {
        r["state"]: (r["peak_concurrency"], r["n_intervals"])
        for r in max_concurrency(_iv(spark, rows)).collect()
    }
    assert got == {"a": (2, 3), "b": (3, 3), "c": (1, 1)}


def test_mad_outliers_known_group(spark):
    # group g: values 10..14 plus a wild 1000 -> median 12.5, MAD 1.5,
    # outlier iff adev > 4.4478*1.5 = 6.6717 -> only 1000
    cents = [10, 11, 12, 13, 14, 1000]
    df = spark.createDataFrame([("g", c) for c in cents], "k string, cents long")
    r = mad_outliers(df, group_col="k", cents_col="cents").collect()[0]
    assert (r["n"], r["med_cents"], r["mad_cents"], r["n_outliers"]) == (6, 12.5, 1.5, 1)


def test_chisq_zero_under_perfect_independence(spark):
    # counts proportional to rowsum*colsum -> chi2 == 0
    rows = (
        [("r1", "c1")] * 4 + [("r1", "c2")] * 8
        + [("r2", "c1")] * 2 + [("r2", "c2")] * 4
    )
    df = spark.createDataFrame(rows, "r string, c string")
    got = chisq_independence(df, "r", "c").collect()[0]
    assert got["chi2"] == 0.0 and got["dof"] == 1 and got["n_rows"] == 18


def test_chisq_hand_computed_2x2(spark):
    # cells: [[10, 0], [0, 10]] -> chi2 = n = 20 (perfect association)
    rows = [("r1", "c1")] * 10 + [("r2", "c2")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    got = chisq_independence(df, "r", "c").collect()[0]
    assert got["chi2"] == 20.0 and got["dof"] == 1


def test_trend_slope_exact_on_linear_series(spark):
    rows = [("t", d, 100 + 7 * d) for d in range(10, 40)]
    df = spark.createDataFrame(rows, "k string, d long, y long")
    got = trend_slopes(df, group_col="k", day_col="d", count_col="y").collect()[0]
    assert got["slope_per_day"] == 7.0 and got["n_days"] == 30


def test_trend_slope_flat_series_is_zero(spark):
    rows = [("t", d, 42) for d in range(5)]
    df = spark.createDataFrame(rows, "k string, d long, y long")
    assert trend_slopes(df, "k", "d", "y").collect()[0]["slope_per_day"] == 0.0
