"""Tests for the m60 PSI drift metric: zero drift on identical
populations, positive and large PSI on a planted shift."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _events(spark, rows):
    base = 1_704_067_200_000_000
    day = 86_400_000_000
    return spark.createDataFrame(
        [(i, 1, base + d * day + i, "click", v) for i, (d, v) in enumerate(rows)],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type", "value",
    )


def test_psi_near_zero_when_identical(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m60_psi as m

    # same value ladder in week 1 (days 0-6) and week 2+
    ladder = [float(v) for v in range(1, 41)]
    rows = [(d, v) for d in (0, 10) for v in ladder]
    df = _events(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    out = m.q223_psi_drift(spark, "unused").collect()
    psi = sum(r["psi_term"] for r in out)
    assert psi < 0.01  # identical distributions: PSI ~ 0


def test_psi_flags_planted_shift(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m60_psi as m

    # reference: values 1..40; current: values 100..140 (total shift)
    rows = [(0, float(v)) for v in range(1, 41)] + [
        (10, float(v)) for v in range(100, 141)
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    out = m.q223_psi_drift(spark, "unused").collect()
    psi = sum(r["psi_term"] for r in out)
    assert psi > 0.25  # the retrain threshold
    assert all(r["psi_term"] >= 0 or abs(r["psi_term"]) < 1e-9 for r in out)


def test_psi_driver_data_consistency(spark):
    import lawfirm_data_pipeline_spark.oracle.m60_psi as m

    rows = m.q223_psi_drift(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert sum(r["n_ref"] + r["n_cur"] for r in rows) == ev.count()
    # shares (smoothed) each sum to ~1
    assert abs(sum(r["ref_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["cur_share"] for r in rows) - 1.0) < 1e-3
