"""Property tests for the m42 wave: k-means invariants, the winnowing
guarantee against a sequential-Python mirror, Bloom-prune soundness."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.bloomjoin import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom_words,
)
from lawfirm_data_pipeline_spark.operators.clustering import kmeans_fixed, to_fp_vec
from lawfirm_data_pipeline_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- k-means
def test_kmeans_partitioning_invariance(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = {r["cluster_id"]: (r["n_vecs"], r["wcss_fp"]) for r in kmeans_fixed(emb).collect()}
    b = {
        r["cluster_id"]: (r["n_vecs"], r["wcss_fp"])
        for r in kmeans_fixed(emb.repartition(13)).collect()
    }
    assert a == b  # exact integer trajectory: partitioning cannot move it


def test_kmeans_lloyd_descent(spark):
    # one more Lloyd iteration never increases total WCSS (with the
    # fixed-point floor the decrease holds up to k*dim rounding slack,
    # each floored component off by <1 micro-unit)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    w1 = sum(r["wcss_fp"] for r in kmeans_fixed(emb, iters=1).collect())
    w2 = sum(r["wcss_fp"] for r in kmeans_fixed(emb, iters=2).collect())
    slack = 8 * 64  # k*dim one-micro-unit floors, squared terms ~1 each
    assert w2 <= w1 + slack
    assert w2 < w1  # real data: the first recompute moves every centroid


def test_kmeans_covers_all_vectors(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = kmeans_fixed(emb).collect()
    assert sum(r["n_vecs"] for r in out) == emb.count()
    assert len(out) <= 8 and all(0 <= r["cluster_id"] < 8 for r in out)


# -------------------------------------------------------------- winnowing
def _winnow_py(text: str, k: int = 4, w: int = 4) -> set[int]:
    toks = [t for t in text.lower().split() if t]
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
    ]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


def test_winnow_matches_python_mirror(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "short one"),
        (2, "a b c d"),          # exactly k tokens -> 1 gram -> 1 fp
        (3, ""),                 # empty -> no fps
        (4, "x y z a b c d e f g h i j k l m n o p q"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for did, text in texts:
        assert got.get(did, set()) == _winnow_py(text), did


def test_winnow_shared_run_guarantee(spark):
    # the SIGMOD'03 guarantee: a shared token run longer than w+k-1
    # yields at least one shared fingerprint, however different the rest
    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (0, f"completely unrelated prefix words here {run}"),
            (1, f"{run} and a totally different suffix tail text"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df).groupBy("fp").count().filter("count = 2")
    assert fps.count() >= 1


def test_winnow_overlap_finds_planted_pastes(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    other = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(0, base), (1, base + " " + other), (2, other[:200])],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in winnow_overlap_pairs(df).collect()}
    assert (0, 1) in pairs  # doc0 fully pasted into doc1 -> containment ~1


# ------------------------------------------------------------ bloom join
def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500, 7).select(F.col("id").alias("k"))
    words = build_bloom_words(keys, "k", n_bits=1 << 12, n_hashes=3)
    probe = spark.range(500).select(F.col("id").alias("k"))
    hits = {
        r["k"]
        for r in probe.filter(
            bloom_might_contain(F.col("k"), words, 1 << 12, 3)
        ).collect()
    }
    assert set(range(0, 500, 7)) <= hits  # membership is never missed


def test_bloom_prune_is_selective(spark):
    keys = spark.range(0, 1000, 100).select(F.col("id").alias("k"))  # 10 keys
    words = build_bloom_words(keys, "k", n_bits=1 << 12, n_hashes=3)
    probe = spark.range(10_000).select(F.col("id").alias("k"))
    n = probe.filter(bloom_might_contain(F.col("k"), words, 1 << 12, 3)).count()
    # 10 true + fp rate well under 5% at ~3.3 bits/key... generous bound
    assert n < 1_000


def test_bloom_semi_join_equals_plain(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    dim = orders.filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    got = bloom_semi_join(li, dim, "l_orderkey", "o_orderkey", n_bits=1 << 14)
    want = li.join(
        dim.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "leftsemi"
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_markov_rows_normalize(spark, duck):
    from lawfirm_data_pipeline_spark.oracle.m42_cluster_bloom import (
        q184_event_transitions,
    )

    pdf = q184_event_transitions(spark, "/root/testdata/sf0.01").toPandas()
    sums = pdf.groupby("src")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-4).all()


def test_kmeans_raises_on_short_input(spark):
    # r3 ADVICE: a seed shortfall must fail loudly, never degrade to
    # fewer clusters; also seeds come from the k smallest ids, not the
    # literal vec_id < k, so non-contiguous id spaces work
    import pytest

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(3)
    with pytest.raises(ValueError, match="need >= 8"):
        kmeans_fixed(emb, k=8)


def test_kmeans_seeding_survives_sparse_id_space(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # shift ids so none fall below k: the old vec_id < k filter found
    # zero seeds here; ranked seeding must still produce k clusters
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 1000)
    got = kmeans_fixed(shifted, k=4, iters=1)
    assert got.count() == 4
