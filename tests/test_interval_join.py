"""Tests for the m53 interval-overlap join: bucketized plan equals the
naive theta-join, and the overlap arithmetic on crafted intervals."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bucketized_equals_naive_theta_join(spark):
    from lawfirm_data_pipeline_spark.oracle.m53_interval_join import (
        q212_interval_join,
    )

    got = {r["promo"]: r for r in q212_interval_join(spark, SF).collect()}
    # naive reference: plain non-equi join on the same derivations
    events = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> session TZ
        .filter(F.col("user_id") % 7 == 0)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    sess = (
        events.withColumn(
            "sid",
            F.sum(F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    promos = spark.range(10).select(
        F.col("id").alias("p"),
        (
            F.lit("2024-01-01 06:00:00").cast("timestamp")
            + F.make_interval(days=F.col("id").cast("int") * 3)
        ).alias("ps"),
        (
            F.lit("2024-01-01 18:00:00").cast("timestamp")
            + F.make_interval(days=F.col("id").cast("int") * 3)
        ).alias("pe"),
    )
    naive = (
        sess.crossJoin(promos)
        .filter((F.col("s_start") <= F.col("pe")) & (F.col("s_end") >= F.col("ps")))
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.unix_micros(F.least("s_end", "pe"))
                - F.unix_micros(F.greatest("s_start", "ps"))
            ).alias("ov"),
        )
    )
    want = {r["p"]: r for r in naive.collect()}
    assert set(got) == set(want)
    for p in want:
        assert got[p]["n_sessions"] == want[p]["n"]
        assert got[p]["overlap_us"] == want[p]["ov"]


def test_overlap_arithmetic_crafted(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m53_interval_join as m

    # user 7 (passes %7): one session fully inside promo 0's window,
    # one session straddling its end, one session far outside
    base = "2024-01-01 "
    rows = [
        # session A inside promo 0 (10-20 min gaps): [08:00, 09:00]
        (0, 7, base + "08:00:00"), (1, 7, base + "08:20:00"),
        (2, 7, base + "08:40:00"), (3, 7, base + "09:00:00"),
        # session B straddles the 18:00 promo end: [17:30, 18:30]
        (4, 7, base + "17:30:00"), (5, 7, base + "17:50:00"),
        (6, 7, base + "18:10:00"), (7, 7, base + "18:30:00"),
        # outside all promos
        (8, 7, "2024-01-02 03:00:00"),
    ]
    df = spark.createDataFrame(
        [(e, u, ts, "click", 0.0) for e, u, ts in rows],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df.filter(F.col("user_id") % 7 == 0))
    out = {r["promo"]: r for r in m.q212_interval_join(spark, "unused").collect()}
    # sessions (30-min gap): [08:00,09:00], [17:30,18:30], [03:00,03:00](day2)
    assert set(out) == {0}
    r = out[0]
    assert r["n_sessions"] == 2
    # overlap: 1h (inside) + 30min (17:30-18:00) = 90 min
    assert r["overlap_us"] == 90 * 60 * 1_000_000
