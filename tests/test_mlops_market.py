"""Property tests for the m29 wave: association rules and the split /
conversion audits' edge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.itemsets import association_rules
from lawfirm_data_pipeline_spark.oracle.m29_mlops_market import (
    q141_split_leakage,
    q144_time_to_convert,
)


def test_association_rules_hand_computed(spark):
    # baskets: {A,B} x3, {A} x1, {B,C} x1  -> n=5, sup A=4, B=4, C=1, AB=3
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "B"),
            (4, "A"), (5, "B"), (5, "C")]
    df = spark.createDataFrame(rows, "ok long, pk string")
    got = {
        (r["ante"], r["cons"]): (r["support"], r["confidence"], r["lift"])
        for r in association_rules(df, min_support=3).collect()
    }
    # conf(A->B) = 3/4; lift = 3*5/(4*4) = 0.9375 both ways
    assert got == {
        ("A", "B"): (3, 0.75, 0.9375),
        ("B", "A"): (3, 0.75, 0.9375),
    }


def test_association_rules_dedups_repeated_items(spark):
    # the same item twice in one basket must count once
    rows = [(i, pk) for i in range(3) for pk in ["A", "A", "B"]]
    df = spark.createDataFrame(rows, "ok long, pk string")
    got = association_rules(df, min_support=3).collect()
    assert len(got) == 2
    assert all(r["support"] == 3 and r["confidence"] == 1.0 and r["lift"] == 1.0 for r in got)


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).select("event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"), "event_type")


def test_time_to_convert_ignores_pre_signup_purchases(spark, monkeypatch, tmp_path):
    import lawfirm_data_pipeline_spark.oracle.m29_mlops_market as m

    hour = 3_600_000_000
    rows = [
        (1, 1, 0 * hour, "purchase"),   # before signup: ignored
        (2, 1, 1 * hour, "signup"),
        (3, 1, 3 * hour, "purchase"),   # +2h -> the first valid conversion
        (4, 1, 9 * hour, "purchase"),   # later purchase ignored (min)
        (5, 2, 0 * hour, "click"),      # user 2 never signs up: excluded
        (6, 2, 1 * hour, "purchase"),
        (7, 3, 5 * hour, "signup"),     # user 3 never purchases: excluded
    ]
    df = _events_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, name, **kw: df)
    r = q144_time_to_convert(spark, "unused").collect()[0]
    assert r["n_converted"] == 1 and r["p50_sec"] == 7200.0 and r["p90_sec"] == 7200.0


def test_split_leakage_buckets(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m29_mlops_market as m

    cutoff_us = 1_705_363_200_000_000  # 2024-01-16T00:00:00Z
    rows = [
        (1, 1, cutoff_us - 10, "click"), (2, 1, cutoff_us - 5, "view"),   # train_only
        (3, 2, cutoff_us + 5, "click"),                                    # test_only
        (4, 3, cutoff_us - 5, "click"), (5, 3, cutoff_us + 5, "view"),    # spanning
        (6, 4, cutoff_us, "click"),                                        # at cutoff -> test_only
    ]
    df = _events_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, name, **kw: df)
    got = {
        r["bucket"]: (r["n_users"], r["n_events"])
        for r in q141_split_leakage(spark, "unused").collect()
    }
    assert got == {
        "train_only": (1, 2),
        "test_only": (2, 2),
        "spanning": (1, 2),
    }
