"""Tests for the m57 wave: bucket-twin pair completeness at boundary
gaps, and LTV accumulation on a crafted cohort."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _events(spark, rows):
    base = 1_704_067_200_000_000
    return spark.createDataFrame(
        [(e, u, base + us, t, v) for e, u, us, t, v in rows],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type", "value",
    )


def test_duplicate_screen_bucket_boundaries(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m57_fraud_ltv as m

    s = 1_000_000
    rows = [
        # u1: same amount, 599s apart but straddling a 600s bucket edge
        (0, 1, 599 * s, "purchase", 10.0),
        (1, 1, 601 * s, "purchase", 10.0),      # gap 2 s, buckets 0 and 1
        # u1: exactly 600 s apart (inclusive boundary)
        (2, 1, 1300 * s, "purchase", 10.0),
        (3, 1, 1900 * s, "purchase", 10.0),     # gap exactly 600 s
        # u2: same amount but 601 s apart -> NOT a pair
        (4, 2, 0, "purchase", 5.0),
        (5, 2, 601 * s, "purchase", 5.0),
        # u3: within window but different amounts -> NOT a pair
        (6, 3, 0, "purchase", 7.0),
        (7, 3, 10 * s, "purchase", 7.01),
        # noise: same shape but not purchases
        (8, 1, 600 * s, "click", 10.0),
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    out = {(r["user_id"], r["cents"]): r for r in m.q219_duplicate_payments(spark, "unused").collect()}
    assert set(out) == {(1, 1000)}
    assert out[(1, 1000)]["n_pairs"] == 2
    assert out[(1, 1000)]["min_gap_us"] == 2 * s


def test_cohort_ltv_crafted(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m57_fraud_ltv as m

    day = 86_400_000_000
    rows = [
        # u1 signs up week 0 (click), buys 10.00 in week 0 and 20.00 in week 1
        (0, 1, 0, "click", 0.0),
        (1, 1, 2 * day, "purchase", 10.0),
        (2, 1, 8 * day, "purchase", 20.0),
        # u2 signs up week 0, never buys
        (3, 2, 1 * day, "click", 0.0),
        # u3 signs up week 1 (first event IS a purchase), buys 5.00
        (4, 3, 7 * day, "purchase", 5.0),
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    out = {(r["cohort"], r["age"]): r for r in m.q220_cohort_ltv(spark, "unused").collect()}
    # cohort 0 (u1, u2): age0 cum 1000 cents, age1 cum 3000
    assert out[(0, 0)]["n_users"] == 2
    assert out[(0, 0)]["cum_cents"] == 1000
    assert out[(0, 1)]["cum_cents"] == 3000
    assert abs(out[(0, 1)]["ltv_per_user"] - 15.0) < 1e-9
    # cohort 1 (u3): age0 cum 500
    assert out[(1, 0)]["n_users"] == 1 and out[(1, 0)]["cum_cents"] == 500


def test_ltv_monotone_on_driver_data(spark):
    import lawfirm_data_pipeline_spark.oracle.m57_fraud_ltv as m

    rows = m.q220_cohort_ltv(spark, SF).collect()
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append((r["age"], r["cum_cents"]))
    for seq in by_cohort.values():
        seq.sort()
        assert all(b[1] >= a[1] for a, b in zip(seq, seq[1:]))  # cumulative
