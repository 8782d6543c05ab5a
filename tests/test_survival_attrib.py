"""Tests for the m56 wave: Kaplan-Meier math on a crafted cohort and
U-shaped credit conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _events(spark, rows):
    # rows: (event_id, user_id, day_offset, event_type, value)
    base = 1_704_067_200_000_000  # 2024-01-01 (a Monday)
    day = 86_400_000_000
    return spark.createDataFrame(
        [(e, u, base + d * day + e, t, v) for e, u, d, t, v in rows],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type", "value",
    )


def test_km_crafted_cohort(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m56_survival as m

    # 4 users: u1 last active week1, u2 week2, u3 & u4 week3 (censored)
    rows = [
        (0, 1, 0, "click", 0.0),
        (1, 2, 1, "click", 0.0), (2, 2, 8, "click", 0.0),
        (3, 3, 2, "click", 0.0), (4, 3, 15, "click", 0.0),
        (5, 4, 16, "click", 0.0),
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    out = {r["w"]: r for r in m.q217_km_churn(spark, "unused").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_risk"] == 4 and out[1]["n_churned"] == 1
    assert out[2]["n_risk"] == 3 and out[2]["n_churned"] == 1
    assert out[3]["n_risk"] == 2 and out[3]["n_churned"] == 0  # censored
    # S(1)=3/4, S(2)=3/4*2/3=1/2, S(3)=1/2
    assert abs(out[1]["survival"] - 0.75) < 1e-6
    assert abs(out[2]["survival"] - 0.5) < 1e-6
    assert abs(out[3]["survival"] - 0.5) < 1e-6


def test_km_zero_churn_week_emitted(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m56_survival as m

    # users last active in weeks 1 and 3 only: week 2 must still get a
    # grid row with hazard 0 (the oracle generates the full series)
    rows = [
        (0, 1, 0, "click", 0.0),
        (1, 2, 0, "click", 0.0), (2, 2, 15, "click", 0.0),
    ]
    df = _events(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    out = {r["w"]: r for r in m.q217_km_churn(spark, "unused").collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_churned"] == 0 and out[2]["n_risk"] == 1


def test_position_attribution_conserves_credit(spark):
    import lawfirm_data_pipeline_spark.oracle.m56_survival as m

    rows = m.q218_position_attribution(spark, SF).collect()
    total_micro = sum(r["credit_micro_cents"] for r in rows)
    # reconstruct the conversions that HAVE at least one touch and sum
    # their cents: credit conservation up to interior floor remainders
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts", "event_id", "event_type",
                F.round(F.col("value") * 100).cast("long").alias("cents"))
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("cid"), "cents"
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("ts").alias("tts"), F.col("event_id").alias("tid")
    )
    attributed = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("tts") <= F.col("cts"))
            & (F.col("tts") >= F.col("cts") - F.expr("INTERVAL 7 DAY"))
            & ((F.col("tts") < F.col("cts")) | (F.col("tid") < F.col("cid")))
        )
        .select("user_id", "cid", "cents")
        .distinct()
    )
    full = attributed.agg(F.sum(F.col("cents") * 1_000_000)).collect()[0][0] or 0
    assert total_micro <= full
    # floor remainders: < 1 micro-credit per interior touch
    n_touches = sum(r["n_touches"] for r in rows)
    assert full - total_micro < n_touches * 200_000
