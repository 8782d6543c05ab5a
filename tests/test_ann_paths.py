"""The two LSH bucket implementations (JVM expressions vs Arrow matmul)
stay interchangeable: same top-k sets on the fixed corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    quantize_int8,
)

SF = "/root/testdata/sf0.01"


def test_arrow_and_jvm_buckets_agree(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    jvm = {
        (r.query_id, r.vec_id)
        for r in lsh_topk(emb, queries, k=10, n_planes=4, n_tables=8, arrow=False).collect()
    }
    arrow = {
        (r.query_id, r.vec_id)
        for r in lsh_topk(emb, queries, k=10, n_planes=4, n_tables=8, arrow=True).collect()
    }
    # buckets can differ only where a plane dot lands exactly on 0.0
    # under different accumulation orders — effectively never on real
    # data; require (near-)identical candidate outcomes
    overlap = len(jvm & arrow) / max(len(jvm | arrow), 1)
    assert overlap >= 0.95, (len(jvm), len(arrow), overlap)


def test_ivf_recall_vs_brute_force(spark):
    """IVF recall on random synthetic vectors (the adversarial case for
    clustering — real embeddings cluster far better): nprobe=8/16 lists
    must recover most of the exact top-10, and exhaustive probing
    (nprobe = n_centroids) must reproduce brute force exactly.
    Measured curve at sf0.01: nprobe 4→0.44, 8→0.79, 12→0.93, 16→1.0."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=8).collect()
    }
    recall = len(exact & approx) / max(len(exact), 1)
    assert recall >= 0.7, recall
    exhaustive = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=16).collect()
    }
    assert exhaustive == exact


def test_ivf_deterministic(spark):
    """Seeding + Lloyd step are engine-order independent: two runs give
    identical (query, id, rank) triples."""
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    a = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=2).collect()
    )
    b = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=2).collect()
    )
    assert a == b and len(a) > 0


def test_quantize_int8_bounds(spark):
    """Quantized components stay in [-127, 127] and reconstruction error
    is bounded by scale/2 (the half-step of the quantizer)."""
    emb = load_table(spark, SF, "embeddings")
    rows = quantize_int8(emb).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert -127 <= r.qmin <= r.qmax <= 127
        assert r.max_err <= r.scale6 / 2 + 1e-6, (r.vec_id, r.max_err, r.scale6)


def test_ann_recall_gate_single_pass_semantics(spark):
    """The r12 one-pass gate rewrite (left join + count of hit markers)
    must reproduce the original two-consumer semantics exactly:
    zero-hit queries count hits=0 (not NULL), short result lists show
    in min_n_results, and the mean is over queries present in approx."""
    from lawfirm_data_pipeline_spark.operators.similarity import ann_recall_gate

    approx = spark.createDataFrame(
        # q1: 2 results, both hits; q2: 2 results, zero hits;
        # q3: 1 result (short list), 1 hit
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30)],
        "query_id long, vec_id long",
    )
    exact = spark.createDataFrame(
        # q2's exact set is disjoint from its approx results; q4 exists
        # only in exact and must NOT create a gated query row
        [(1, 10), (1, 11), (2, 98), (2, 99), (3, 30), (3, 31), (4, 40)],
        "query_id long, vec_id long",
    )
    # mean recall@2 = (2/2 + 0/2 + 1/2) / 3 = 0.5
    row_ok = ann_recall_gate(approx, exact, k=2, threshold=0.5).collect()[0]
    assert (row_ok.n_queries, row_ok.min_n_results, row_ok.recall_ok) == (3, 1, True)
    row_fail = ann_recall_gate(approx, exact, k=2, threshold=0.51).collect()[0]
    assert (row_fail.n_queries, row_fail.min_n_results, row_fail.recall_ok) == (
        3,
        1,
        False,
    )
