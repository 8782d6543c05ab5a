"""Round-3 operators: BM25 retrieval, keep-best dedup, incremental
dedup, temperature mixture weights, OOV audit, normalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.operators.curation import oov_stats, vocab_topk
from lawfirm_data_pipeline_spark.operators.dedup import (
    incremental_exact_dedup,
    keep_best_in_group,
)
from lawfirm_data_pipeline_spark.operators.retrieval import bm25_scores, bm25_topk
from lawfirm_data_pipeline_spark.operators.sampling import temperature_mixture_weights
from lawfirm_data_pipeline_spark.operators.text import normalize_text

SF = "/root/testdata/sf0.01"


def test_bm25_rewards_tf_and_penalizes_length(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler"),
            (2, "spark filler filler filler"),
            (3, "spark " + "filler " * 40),
            (4, "nothing relevant here"),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.score for r in bm25_scores(docs, ["spark"]).collect()}
    assert 4 not in got  # no matching term -> no row
    assert got[1] > got[2]  # higher tf wins
    assert got[2] > got[3]  # same tf, shorter doc wins


def test_bm25_topk_deterministic_cut(spark):
    docs = load_table(spark, SF, "documents")
    a = [tuple(r) for r in bm25_topk(docs, ["spark", "window", "hash"], k=10).collect()]
    b = [tuple(r) for r in bm25_topk(docs.repartition(7), ["spark", "window", "hash"], k=10).collect()]
    assert a == b and len(a) == 10
    scores = [s for _, s in a]
    assert scores == sorted(scores, reverse=True)


def test_keep_best_prefers_quality_then_min_id(spark):
    docs = spark.createDataFrame(
        [(1, "dup"), (2, "dup"), (3, "dup"), (10, "uniq")],
        "doc_id int, text string",
    )
    # quality: doc 2 longest "virtual" quality; tie between 1 and 3 -> min id
    quality = F.when(F.col("doc_id") == 2, 5).otherwise(1)
    out = {r.fp: (r.best_id, r.best_quality, r.group_size)
           for r in keep_best_in_group(docs, quality=quality).collect()}
    groups = {gs for _, (_, _, gs) in out.items()}
    assert groups == {3, 1}
    (dup_best,) = [v for v in out.values() if v[2] == 3]
    assert dup_best[:2] == (2, 5)


def test_incremental_dedup_drops_history_and_batch_dups(spark):
    hist = spark.createDataFrame([(1, "old"), (2, "older")], "doc_id int, text string")
    batch = spark.createDataFrame(
        [(10, "old"), (11, "new"), (12, "new"), (13, "brand new")],
        "doc_id int, text string",
    )
    kept = sorted(r.doc_id for r in incremental_exact_dedup(batch, hist).collect())
    # 10 == history; 12 dups 11 within batch
    assert kept == [11, 13]


def test_temperature_weights_flatten_toward_uniform(spark):
    docs = load_table(spark, SF, "documents")
    w_nat = {r.source: r.weight for r in
             temperature_mixture_weights(docs, "source", "n_chars", alpha=1.0).collect()}
    w_cool = {r.source: r.weight for r in
              temperature_mixture_weights(docs, "source", "n_chars", alpha=0.3).collect()}
    assert abs(sum(w_nat.values()) - 1.0) < 1e-4
    assert abs(sum(w_cool.values()) - 1.0) < 1e-4
    # lower alpha compresses the spread
    spread = lambda w: max(w.values()) - min(w.values())  # noqa: E731
    assert spread(w_cool) < spread(w_nat)


def test_oov_rate_bounds_and_zero_for_full_vocab(spark):
    docs = load_table(spark, SF, "documents")
    # full corpus vocabulary -> zero OOV everywhere
    full_vocab = vocab_topk(docs, k=100000).select("w")
    full = oov_stats(docs, full_vocab)
    assert full.filter(F.col("n_oov") != 0).count() == 0
    # tiny vocab -> rates in (0, 1]
    tiny = oov_stats(docs, vocab_topk(docs, k=3).select("w"))
    bad = tiny.filter((F.col("oov_rate") < 0) | (F.col("oov_rate") > 1)).count()
    assert bad == 0
    assert tiny.agg(F.max("oov_rate")).first()[0] > 0


def test_normalize_text_strips_and_is_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "<p>Hello   <b>World</b></p>\n\n  trailing  ")],
        "id int, text string",
    )
    once = df.select(normalize_text("text").alias("n"))
    assert once.first().n == "hello world trailing"
    twice = once.select(normalize_text("n").alias("n"))
    assert twice.first().n == "hello world trailing"
