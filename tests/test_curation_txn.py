"""M61 wave unit tests: CUPED arithmetic, keyword tagging, SemDeDup
policy invariants (oracle equivalence is covered by
tests/test_oracle_queries.py for q224-q227)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.stats import cuped_adjusted_means
from lawfirm_data_pipeline_spark.operators.text import keyword_tags

SF = "/root/testdata/sf0.001"


def test_cuped_matches_hand_computation(spark):
    # users: (arm, pre, post); constructed so theta = 2 exactly
    rows = [(0, 100, 250), (0, 200, 420), (1, 100, 260), (1, 200, 470)]
    df = spark.createDataFrame(rows, "arm int, pre_cents long, post_cents long")
    got = {r["arm"]: r for r in cuped_adjusted_means(df).collect()}
    # pooled: n=4, sp=600, so=1400, spp=100000, spo=225000
    # theta = (4*225000-600*1400)/(4*100000-600^2) = 60000/40000 = 1.5
    # global pre mean = 150
    # arm0: raw=335, pre_mean=150 -> adjusted = 335 - 1.5*0 = 335
    # arm1: raw=365, pre_mean=150 -> adjusted = 365
    assert got[0]["n_users"] == 2
    assert abs(got[0]["adjusted_mean"] - 3.35) < 1e-9
    assert abs(got[1]["adjusted_mean"] - 3.65) < 1e-9
    # identical pre distributions -> adjustment leaves means untouched
    assert got[0]["raw_mean"] == got[0]["adjusted_mean"]


def test_cuped_removes_covariate_imbalance(spark):
    # post = pre exactly (pure covariate effect, no treatment effect):
    # CUPED must equalize the arms despite raw means differing
    rows = [(0, 100, 100), (0, 120, 120), (1, 300, 300), (1, 320, 320)]
    df = spark.createDataFrame(rows, "arm int, pre_cents long, post_cents long")
    got = {r["arm"]: r for r in cuped_adjusted_means(df).collect()}
    assert got[0]["raw_mean"] != got[1]["raw_mean"]
    assert abs(got[0]["adjusted_mean"] - got[1]["adjusted_mean"]) < 1e-6


def test_keyword_tags_sorted_and_filtered(spark):
    df = spark.createDataFrame(
        [(1, "Spark joins the STREAM"), (2, "nothing relevant here"), (3, "merge merge merge")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["tags_str"], r["n_tags"]) for r in
           keyword_tags(df, ["stream", "join", "spark", "merge"]).collect()}
    assert got[1] == ("spark|stream", 2)  # 'joins' != 'join'; lowercased; sorted
    assert got[3] == ("merge", 1)  # distinct tokens, not occurrences
    assert 2 not in got  # zero-match docs filtered


def test_semantic_dedup_drops_planted_copies(spark):
    from lawfirm_data_pipeline_spark.operators.similarity import semantic_dedup_policy
    from lawfirm_data_pipeline_spark.oracle._shared import planted_vectors

    got = semantic_dedup_policy(
        planted_vectors(spark, SF), threshold=0.9, id_col="vec_id", vec_col="v"
    )
    rows = {r["vec_id"]: r for r in got.collect()}
    # every planted copy (id >= 100000) has its lower-id original -> dropped
    planted = [v for v in rows if v >= 100000]
    assert planted and all(not rows[v]["kept"] for v in planted)
    # originals of the planted copies are kept (they ARE the lowest id)
    assert all(rows[v - 100000]["kept"] for v in planted)


def test_cuped_partitioning_invariance(spark):
    # integer-sums-only discipline: any repartitioning produces the
    # bit-identical readout
    from lawfirm_data_pipeline_spark.operators.stats import cuped_adjusted_means

    rows = [(i % 2, (i * 37) % 500, (i * 91) % 700) for i in range(200)]
    df = spark.createDataFrame(rows, "arm int, pre_cents long, post_cents long")
    a = sorted(map(tuple, cuped_adjusted_means(df).collect()))
    b = sorted(map(tuple, cuped_adjusted_means(df.repartition(17)).collect()))
    assert a == b


def test_frame_pooling_partitioning_invariance(spark):
    from lawfirm_data_pipeline_spark.operators.multimodal import pool_frame_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    frames = emb.selectExpr("vec_id div 8 AS media_id", "embedding")
    a = sorted(map(tuple, pool_frame_embeddings(frames).collect()))
    b = sorted(map(tuple, pool_frame_embeddings(frames.repartition(13)).collect()))
    assert a == b  # exact micro-unit sums: order/partitioning cannot move them


def test_bmp_decode_handles_padding_and_bottom_up(spark):
    # widths 4..8 exercise every row-padding case (stride % 4 in all
    # residues); the decoder must also walk rows bottom-up correctly
    from lawfirm_data_pipeline_spark.operators.multimodal import (
        decode_bmp_stats,
        synth_bmp_bytes,
        synth_bmp_media,
    )

    got = {
        r["media_id"]: (r["width"], r["height"], r["px_sum"])
        for r in decode_bmp_stats(synth_bmp_media(spark, n=20)).collect()
    }
    import struct

    for mid in range(20):
        raw = synth_bmp_bytes(mid)
        w, h = struct.unpack_from("<ii", raw, 18)
        expected = sum(
            ((mid * 7 + x * 3 + y * 5) % 256)
            + ((mid * 11 + x + 2 * y) % 256)
            + ((mid * 13 + 2 * x + y) % 256)
            for x in range(w)
            for y in range(h)
        )
        assert got[mid] == (w, h, expected), mid


def test_record_stream_detects_truncated_frame(spark):
    import pytest

    from lawfirm_data_pipeline_spark.operators.ingest import parse_record_stream

    # frame claims 100 bytes but carries 5 — the parser must fail
    # loudly, never emit a desynchronized record
    import struct

    bad = struct.pack(">QI", 1, 100) + b"short"
    files = spark.createDataFrame([(0, bytearray(bad))], "file_id long, blob binary")
    with pytest.raises(Exception, match="truncated frame"):
        parse_record_stream(files).collect()


def test_gzip_roundtrip_is_lossless_on_crafted_text(spark):
    from lawfirm_data_pipeline_spark.operators.ingest import (
        gzip_compress_corpus,
        gzip_decompress_stats,
    )

    df = spark.createDataFrame(
        [(1, "héllo wörld"), (2, ""), (3, "a" * 10000)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_bytes"], r["digest"]) for r in
           gzip_decompress_stats(gzip_compress_corpus(df)).collect()}
    import hashlib

    for did, text in [(1, "héllo wörld"), (2, ""), (3, "a" * 10000)]:
        raw = text.encode("utf-8")
        assert got[did] == (len(raw), hashlib.md5(raw).hexdigest())


def test_bpe_encode_marker_semantics(spark):
    # "the"->1 token, "then"->2 (the+n), "thin"->2 (th+in), "banana"
    # -> b+an+an+a = 4 (merges scan left-to-right non-overlapping)
    from lawfirm_data_pipeline_spark.queries import QUERIES

    df = spark.createDataFrame(
        [(0, "the then thin banana")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("___bpe_probe")
    from lawfirm_data_pipeline_spark.oracle.m69_bpe_shards import _MERGES
    from pyspark.sql import functions as F

    merged = F.col("norm")
    for pat, rep in _MERGES:
        merged = F.replace(merged, F.lit(pat), F.lit(rep))
    got = (
        df.select(F.array_join(F.split("text", " "), " ").alias("norm"))
        .select((F.length(merged) - 3).alias("n_bpe"))
        .collect()[0]["n_bpe"]
    )
    assert got == 1 + 2 + 2 + 4
