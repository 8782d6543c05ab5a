"""Property tests for the m31 wave: Zipf fit, vocab stats, imputation
audit, content checksums."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.profile import table_checksum
from lawfirm_data_pipeline_spark.operators.stats import impute_group_median_audit
from lawfirm_data_pipeline_spark.operators.text import vocab_stats, zipf_fit


def test_zipf_slope_recovers_exact_power_law(spark):
    # frequencies f(r) = round(1000 * r^-1): ln-ln regression must come
    # out near -1 (exactly -1 up to the rounding of f and the 1e-6 snap)
    words = [(1, " ".join(f"w{r}" for r in range(1, 40) for _ in range(round(1000 * r ** -1.0))))]
    df = spark.createDataFrame(words, "doc_id long, text string").withColumn(
        "source", F.lit("s")
    )
    r = zipf_fit(df).collect()[0]
    assert r["vocab_size"] == 39
    assert abs(r["zipf_slope"] + 1.0) < 0.01


def test_vocab_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a d")], "doc_id long, text string"
    ).withColumn("source", F.lit("s"))
    r = vocab_stats(df).collect()[0]
    # tokens: a x3, b, c, d -> 6 tokens, 4 types, 3 hapax (b, c, d)
    assert (r["n_tokens"], r["vocab"], r["hapax"]) == (6, 4, 3)
    assert r["type_token_ratio"] == round(4 / 6, 6)
    assert r["hapax_ratio"] == 0.75


def test_impute_audit_hand_computed(spark):
    rows = [("g", 10), ("g", 20), ("g", 30), ("g", None), ("g", None)]
    df = spark.createDataFrame(rows, "grp string, cents long")
    r = impute_group_median_audit(df, "grp", "cents").collect()[0]
    # median of {10,20,30} = 20; imputed sum = 60 + 2*20 = 100; mean 20
    assert (r["n_rows"], r["n_imputed"], r["med_cents"], r["mean_cents_after"]) == (
        5, 2, 20.0, 20.0,
    )


def test_checksum_partition_invariant_and_content_sensitive(spark):
    rows = [(i, f"s{i % 5}") for i in range(1000)]
    a = spark.createDataFrame(rows, "k long, s string")
    b = spark.createDataFrame(rows, "k long, s string").repartition(17)
    ca = table_checksum(a, ["k", "s"], "t").collect()[0]
    cb = table_checksum(b, ["k", "s"], "t").collect()[0]
    assert (ca["n_rows"], ca["checksum"]) == (cb["n_rows"], cb["checksum"])
    # flipping one cell must move the checksum
    c = spark.createDataFrame(rows[:-1] + [(999, "sX")], "k long, s string")
    cc = table_checksum(c, ["k", "s"], "t").collect()[0]
    assert cc["checksum"] != ca["checksum"]


def test_checksum_null_vs_empty_distinct(spark):
    a = spark.createDataFrame([(1, None)], "k long, s string")
    b = spark.createDataFrame([(1, "")], "k long, s string")
    assert (
        table_checksum(a, ["k", "s"], "t").collect()[0]["checksum"]
        != table_checksum(b, ["k", "s"], "t").collect()[0]["checksum"]
    )


def test_spend_decile_boundary_rule(spark, monkeypatch):
    # 10 users with totals 1..10: thresholds at i/10 percentiles; the
    # strictly-greater rule must put exactly one user per decile
    import lawfirm_data_pipeline_spark.oracle.m37_distribution as m

    rows = [(u, 1_700_000_000_000_000, "purchase", float(u + 1)) for u in range(10)]
    df = spark.createDataFrame(
        rows, "user_id long, us long, event_type string, value double"
    ).select("user_id", F.timestamp_micros(F.col("us")).alias("ts"), "event_type", "value")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["decile"], r["n_users"], r["min_cents"], r["max_cents"])
        for r in m.q170_spend_deciles(spark, "unused").collect()
    )
    assert [g[1] for g in got] == [1] * 10
    assert got[0] == (1, 1, 100, 100) and got[-1] == (10, 1, 1000, 1000)
