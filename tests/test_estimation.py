"""Property tests for the m45 wave: allocation identities,
capture-recapture consistency, readability mirror, sketch-estimator
exactness when the sketch covers every key."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_neyman_weights_and_budget(spark):
    import lawfirm_data_pipeline_spark.oracle.m45_estimation as m

    rows = m.q193_neyman_allocation(spark, SF).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-4
    # per-row rounding keeps the realized budget within n_strata/2 of 1000
    assert abs(sum(r["alloc"] for r in rows) - 1000) <= len(rows)
    assert all(r["alloc"] >= 0 and r["sd_bal"] >= 0 for r in rows)


def test_capture_recapture_consistency(spark):
    import lawfirm_data_pipeline_spark.oracle.m45_estimation as m

    r = m.q194_capture_recapture(spark, SF).collect()[0]
    truth = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert r["n_true"] == truth
    assert r["nab"] <= min(r["na"], r["nb"])
    assert r["n_est"] == round(r["na"] * r["nb"] / r["nab"])
    # two independent 20% captures of ~1.5k keys: estimator lands well
    # inside +-30% at this size
    assert abs(r["n_est"] - truth) / truth < 0.3


def test_readability_python_mirror(spark, monkeypatch):
    import re

    import lawfirm_data_pipeline_spark.oracle.m45_estimation as m

    texts = [
        (0, "srcX", "The cat sat. The dog ran! A bird flew?"),
        (1, "srcX", "Incomprehensibilities notwithstanding, equanimity prevails."),
        (2, "srcY", "one two three"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, source string, text string")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    out = {r["source"]: r for r in m.q195_readability(spark, "unused").collect()}
    for src in ("srcX", "srcY"):
        docs = [t for _, s, t in texts if s == src]
        tw = sum(len([w for w in t.lower().split() if w]) for t in docs)
        ts = sum(max(len(re.split(r"[.!?]+", t)) - 1, 1) for t in docs)
        tsy = sum(len(re.findall(r"[aeiouy]+", t.lower())) for t in docs)
        r = out[src]
        assert r["n_docs"] == len(docs)
        assert abs(r["words_per_sentence"] - round(tw / ts, 4)) < 1e-9
        assert abs(r["syllables_per_word"] - round(tsy / tw, 4)) < 1e-9
        want = round(206.835 - 1.015 * (tw / ts) - 84.6 * (tsy / tw), 4)
        assert abs(r["flesch"] - want) < 1e-6


def test_join_estimate_exact_when_sketch_covers(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m45_estimation as m

    # 15 distinct keys (< TOPK=20): the sketch IS the histogram, the
    # tail term vanishes, and the estimate must equal the truth
    li = spark.range(300).select((F.col("id") % 15).alias("l_suppkey"))
    sup = spark.range(15).select(F.col("id").alias("s_suppkey"))

    def fake_load(sp, sf, name, **kw):
        return li if name == "lineitem" else sup

    monkeypatch.setattr(m, "load_table", fake_load)
    r = m.q196_join_card_estimate(spark, "unused").collect()[0]
    assert r["actual"] == 300  # every key matches once
    assert r["estimate"] == r["actual"]
    assert r["rel_error"] == 0.0


def test_join_estimate_on_real_data(spark):
    import lawfirm_data_pipeline_spark.oracle.m45_estimation as m

    r = m.q196_join_card_estimate(spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert r["actual"] == li.join(
        spark.read.parquet(f"{SF}/supplier.parquet"),
        li.l_suppkey == F.col("s_suppkey"),
    ).count()
    assert r["rel_error"] < 0.2  # near-uniform fact keys: tail model fits
