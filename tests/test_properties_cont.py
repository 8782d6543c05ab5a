"""Hypothesis invariants for the m42-m54 continuation operators:

* Bloom membership is NEVER missed, for arbitrary key multisets and
  tiny filters (high-fp regime — exactly where a false negative would
  hide);
* winnowing fingerprints == the sequential reference on arbitrary
  token soups (short docs, repeated tokens, boundary lengths);
* k-means cluster totals partition the input under arbitrary
  repartitioning (the exact-integer trajectory claim, adversarially
  shuffled);
* Morton interleave round-trips bit-exactly against the Python mirror
  over arbitrary coordinates.

Few, small examples — hypothesis's value here is boundary shapes
(empty strings, single tokens, all-equal keys), not volume.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.bloomjoin import (
    bloom_might_contain,
    build_bloom_words,
)
from lawfirm_data_pipeline_spark.operators.clustering import kmeans_fixed
from lawfirm_data_pipeline_spark.operators.dedup import winnow_fingerprints
from lawfirm_data_pipeline_spark.operators.profile import morton_code

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@SLOW
@given(
    keys=st.lists(st.integers(0, 1000), min_size=1, max_size=30),
    probes=st.lists(st.integers(0, 1000), min_size=1, max_size=30),
)
def test_bloom_never_misses(spark, keys, probes):
    kdf = spark.createDataFrame([(k,) for k in set(keys)], "k long")
    words = build_bloom_words(kdf, "k", n_bits=256, n_hashes=3)  # tiny -> high fp
    pdf = spark.createDataFrame([(p,) for p in set(probes)], "k long")
    hits = {
        r["k"]
        for r in pdf.filter(bloom_might_contain(F.col("k"), words, 256, 3)).collect()
    }
    assert (set(keys) & set(probes)) <= hits


def _winnow_py(toks, k=4, w=4):
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc de fgh ij klm".split()), max_size=12),
        min_size=1,
        max_size=4,
    )
)
def test_winnow_equals_sequential(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, toks in enumerate(docs):
        assert got.get(i, set()) == _winnow_py(toks), toks


@SLOW
@given(seed=st.integers(2, 97))
def test_kmeans_partition_invariant_and_total(spark, seed):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = {
        r["cluster_id"]: (r["n_vecs"], r["wcss_fp"])
        for r in kmeans_fixed(emb).collect()
    }
    shuffled = {
        r["cluster_id"]: (r["n_vecs"], r["wcss_fp"])
        for r in kmeans_fixed(emb.repartition(seed)).collect()
    }
    assert base == shuffled
    assert sum(n for n, _ in base.values()) == emb.count()


@SLOW
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
        min_size=1,
        max_size=12,
    )
)
def test_morton_bit_exact(spark, pts):
    df = spark.createDataFrame(list(set(pts)), "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton_code("x", "y").alias("z")).collect()
    }
    for x, y in set(pts):
        want = 0
        for i in range(10):
            want |= ((x >> i) & 1) << (2 * i)
            want |= ((y >> i) & 1) << (2 * i + 1)
        assert got[(x, y)] == want
