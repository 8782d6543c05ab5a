"""M63 wave unit tests: restart recovery invariants, join-IVM delta
algebra on crafted tables, nearest-as-of semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_maintain_join_totals_equals_recompute(spark):
    from lawfirm_data_pipeline_spark.operators.ivm import maintain_join_totals

    a_old = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, cents long")
    a_ins = spark.createDataFrame([(1, 5), (4, 40)], "k long, cents long")
    b_old = spark.createDataFrame([(1, 100), (2, 100), (4, 200)], "k long, nat long")
    b_ins = spark.createDataFrame([(3, 200)], "k long, nat long")
    view_old = (
        a_old.join(b_old, "k")
        .groupBy("nat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("total"),
        )
    )
    got = {
        r["nat"]: (r["n_rows"], r["total"])
        for r in maintain_join_totals(
            view_old, a_old, a_ins, b_old, b_ins, "k", "nat", "cents"
        ).collect()
    }
    full = {
        r["nat"]: (r["n_rows"], r["total"])
        for r in a_old.unionByName(a_ins)
        .join(b_old.unionByName(b_ins), "k")
        .groupBy("nat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("total"),
        )
        .collect()
    }
    assert got == full  # delta algebra == recompute, bit-identical


def test_asof_nearest_picks_closest_and_breaks_ties(spark):
    from lawfirm_data_pipeline_spark.operators.temporal import asof_nearest

    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 12:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (7, "2024-01-01 11:30:00", 100),  # 30 min before
            (7, "2024-01-01 12:20:00", 101),  # 20 min after  -> winner
            (7, "2024-01-01 15:00:00", 102),  # outside ±1 h
            (8, "2024-01-01 12:00:00", 103),  # other key
        ],
        "user_id long, ts string, click_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = asof_nearest(
        left, right, key="user_id", left_id="event_id",
        tolerance_us=3_600_000_000, right_payload=["click_id"],
        tie_break="click_id",
    ).collect()
    assert len(got) == 1 and got[0]["click_id"] == 101
    assert got[0]["gap_us"] == 20 * 60 * 1_000_000


def test_asof_nearest_equidistant_tie_prefers_earlier(spark):
    from lawfirm_data_pipeline_spark.operators.temporal import asof_nearest

    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 12:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(7, "2024-01-01 11:50:00", 200), (7, "2024-01-01 12:10:00", 201)],
        "user_id long, ts string, click_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = asof_nearest(
        left, right, key="user_id", left_id="event_id",
        tolerance_us=3_600_000_000, right_payload=["click_id"],
        tie_break="click_id",
    ).collect()
    assert got[0]["click_id"] == 200  # equal gap -> earlier right ts wins


def test_asof_nearest_drops_unmatched(spark):
    from lawfirm_data_pipeline_spark.operators.temporal import asof_nearest

    left = spark.createDataFrame(
        [(1, 7, "2024-01-01 12:00:00")], "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(7, "2024-01-02 12:00:00", 300)], "user_id long, ts string, click_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    assert (
        asof_nearest(
            left, right, key="user_id", left_id="event_id",
            tolerance_us=3_600_000_000, right_payload=["click_id"],
            tie_break="click_id",
        ).count()
        == 0
    )


def test_stream_restart_does_not_reprocess(spark, tmp_path):
    """Phase-2 restart with the same checkpoint must process ONLY the
    new file: sink row count equals the batch union, not double."""
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    spark.range(10).withColumnRenamed("id", "v").write.parquet(src)

    def drain():
        q = (
            spark.readStream.schema("v long").parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    drain()
    spark.range(10, 15).withColumnRenamed("id", "v").write.mode("append").parquet(src)
    drain()
    got = spark.read.parquet(sink)
    assert got.count() == 15
    assert got.agg(F.sum("v")).collect()[0][0] == sum(range(15))
