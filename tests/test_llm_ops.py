"""LLM-pipeline operator tests: planted-duplicate recovery, LSH recall
vs brute force, SimHash pairing, multimodal kernel correctness."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.operators.dedup import (
    dedup_keep_canonical,
    minhash_lsh_dedup,
    simhash_neardup_pairs,
)
from lawfirm_data_pipeline_spark.operators.multimodal import (
    decode_image,
    image_features_stub,
    synth_media,
)
from lawfirm_data_pipeline_spark.operators.similarity import brute_force_topk, lsh_topk
from lawfirm_data_pipeline_spark.oracle.m6_dedup import _planted_corpus

SF = "/root/testdata/sf0.01"


def test_planted_pairs_are_found_not_vacuous(spark):
    """The oracle dedup queries only prove something if the planted dups
    actually surface; assert the expected pair inventory."""
    corpus = _planted_corpus(spark, SF)
    verified = minhash_lsh_dedup(corpus, threshold=0.5, k=16, bands=4)
    pairs = {(r.ida, r.idb) for r in verified.collect()}
    # every exact copy (doc_id%25==0 → +200000) must pair with its source
    exact_expect = {(i, i + 200000) for i in range(0, 150, 25)}
    assert exact_expect <= pairs
    # near copies (first token dropped) pair at high jaccard
    near_expect = {(i, i + 100000) for i in range(0, 150, 10)}
    assert len(near_expect & pairs) >= len(near_expect) * 0.8
    for r in verified.collect():
        assert r.jaccard >= 0.5


def test_dedup_keep_canonical_drops_exact_copies(spark):
    corpus = _planted_corpus(spark, SF)
    kept = dedup_keep_canonical(corpus)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # planted copies always lose to their lower-id source (min-id canonical)
    assert all(i + 200000 not in ids for i in range(0, 150, 25))
    # result is exactly one row per distinct fingerprint
    from lawfirm_data_pipeline_spark.operators.dedup import exact_dedup

    assert kept.count() == exact_dedup(corpus).count()


def test_simhash_finds_near_dups(spark):
    corpus = _planted_corpus(spark, SF)
    pairs = {
        (r.ida, r.idb)
        for r in simhash_neardup_pairs(corpus, max_hamming=2, bits=16).collect()
    }
    exact_expect = {(i, i + 200000) for i in range(0, 150, 25)}
    assert exact_expect <= pairs  # hamming 0 for identical token sets


def test_lsh_ann_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, queries, k=10)
    approx = lsh_topk(emb, queries, k=10, n_planes=4, n_tables=8)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # random 64-dim corpus is a hard case; sign-LSH with 6×6 tables should
    # still recover a solid share of true neighbors
    assert recall >= 0.5, f"recall@10 = {recall}"


def test_multimodal_feature_kernel_matches_reference_hash(spark):
    media = synth_media(spark, 16)
    out = {r.media_id: r for r in image_features_stub(media).collect()}
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, row in out.items():
        digest = hashlib.md5(payloads[mid]).hexdigest()
        assert row.phash == digest[:16]
        assert row.n_bytes == len(payloads[mid])
        assert len(row.features) == 8
        assert abs(row.features[0] - int(digest[:2], 16) / 255.0) < 1e-6


def test_decode_image_dispatches_mixed_formats(spark):
    """r10: decode_image is no longer a stub — it dispatches
    JPEG/BMP/PNG per-row by payload magic in ONE mixed batch and
    LOUD-fails unknown magics (synth_media payloads are md5-derived
    bytes, not images)."""
    from pyspark.sql import Row, functions as F

    from lawfirm_data_pipeline_spark.operators.multimodal import (
        bmp_stats_of,
        png_stats_of,
        synth_bmp_bytes,
        synth_jpeg_bytes,
        synth_png_bytes,
    )

    payloads = {
        0: synth_jpeg_bytes(2),
        1: synth_bmp_bytes(3),
        2: synth_png_bytes(4),
        3: synth_jpeg_bytes(5),
    }
    df = spark.createDataFrame(
        [Row(media_id=k, payload=bytearray(v)) for k, v in payloads.items()]
    )
    rows = {
        r["media_id"]: (r["width"], r["height"], r["px_sum"])
        for r in decode_image(df).collect()
    }
    assert rows[1] == bmp_stats_of(payloads[1])
    assert rows[2] == png_stats_of(payloads[2])
    for mid, jid in ((0, 2), (3, 5)):
        w, h, s = rows[mid]
        assert (w, h) == (16 + 8 * (jid % 3), 8 + 8 * (jid % 4))
        assert s == sum(
            64 * ((jid * 7 + bx * 3 + by * 5) % 256)
            for bx in range(w // 8)
            for by in range(h // 8)
        )
    with pytest.raises(Exception, match="unknown image magic"):
        decode_image(synth_media(spark, 1)).collect()


def test_resize_stub_output_size_and_cycle(spark):
    from lawfirm_data_pipeline_spark.operators.multimodal import resize_image_stub

    media = synth_media(spark, 8)
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    out = {r.media_id: r for r in resize_image_stub(media, 4, 4).collect()}
    assert set(out) == set(src)
    for mid, row in out.items():
        b = bytes(row.payload)
        assert len(b) == 16 and (row.width, row.height) == (4, 4)
        # cycled from source bytes
        expect = (src[mid] * (16 // len(src[mid]) + 1))[:16]
        assert b == expect


def test_audio_windows_cover_duration_and_energy_is_deterministic(spark):
    from lawfirm_data_pipeline_spark.operators.multimodal import (
        audio_window_features_stub,
    )

    media = spark.range(3).selectExpr(
        "id AS media_id",
        "CAST(NULL AS BINARY) AS payload",
        """named_struct('media_type','audio','mime','audio/wav',
            'width',CAST(NULL AS INT),'height',CAST(NULL AS INT),
            'duration_ms', 100 + CAST(id AS INT) * 300,
            'sample_rate', 16000) AS meta""",
    )
    out = audio_window_features_stub(media, window_ms=250).collect()
    import math

    per = {}
    for r in out:
        per.setdefault(r.media_id, []).append(r)
    for mid, rows in per.items():
        dur = 100 + mid * 300
        assert len(rows) == max(math.ceil(dur / 250), 1)
        for r in rows:
            want = int(hashlib.md5(f"{mid}:{r.widx}".encode()).hexdigest()[:4], 16)
            assert r.energy == want and r.win_start_ms == r.widx * 250
