"""Tests for the m58 TextRank composition: hub word ranks first on a
crafted corpus, and the pipeline stays deterministic under
repartitioning (the integer fixed-point claim end-to-end)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_textrank_hub_word_wins(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m58_textrank as m

    monkeypatch.setattr(m, "_MIN_COUNT", 1)
    # "hub" co-occurs with every other word; spokes only touch hub
    docs = [
        (i, f"hub spoke{i} hub spoke{i} hub") for i in range(6)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    out = sorted(
        m.q221_textrank_keywords(spark, "unused").collect(), key=lambda r: r["rnk"]
    )
    assert out[0]["word"] == "hub"
    assert all(r["rank_fp"] < out[0]["rank_fp"] for r in out[1:])


def test_textrank_partition_invariant(spark):
    import lawfirm_data_pipeline_spark.oracle.m58_textrank as m

    base = {
        (r["word"], r["rank_fp"], r["rnk"])
        for r in m.q221_textrank_keywords(spark, SF).collect()
    }
    # same derivation over an adversarially repartitioned scan
    import lawfirm_data_pipeline_spark.io as io_mod

    orig = m.load_table

    def shuffled(sp, sf, name, **kw):
        return orig(sp, sf, name, **kw).repartition(17)

    try:
        m.load_table = shuffled
        again = {
            (r["word"], r["rank_fp"], r["rnk"])
            for r in m.q221_textrank_keywords(spark, SF).collect()
        }
    finally:
        m.load_table = orig
    assert base == again
