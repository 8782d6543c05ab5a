"""Cache-lifecycle hygiene (r12 verdict task #1).

Operators must not leave entries in the session CacheManager after their
returned plan has been fully consumed: Spark matches cached plans by
logical subtree, so a leaked ``cache()``/``persist()`` (a) accumulates
executor storage for the session's lifetime — multi-TB at 100 TB for
corpus-scale pins like q58's per-(doc, token) counts — and (b) lets a
LATER run of the same query (bench.py's min-of-2 second pass) silently
read the first run's InMemoryRelation, so the measurement partially
times warm-cache execution.

The fix (r13): every multi-consumer pin inside the query-path operators
is an **eager ``localCheckpoint``**, not a ``cache()`` — checkpoint
blocks are not registered in the CacheManager and are freed by the
ContextCleaner once the plan is garbage collected; corpus-scale pins
additionally take an explicit serialized ``MEMORY_AND_DISK`` level.
These tests run each converted operator end to end and assert the
CacheManager holds nothing afterwards.

Queries whose (bounded, summary-sized) pins still legitimately use
``cache()`` are covered at the bench level: bench.py clears the SQL
cache between passes, so no timed run can read a previous pass's cache.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _cache_manager_empty(spark) -> bool:
    return bool(spark._jsparkSession.sharedState().cacheManager().isEmpty())


@pytest.fixture()
def clean_cache(spark):
    # other tests in the shared session may legitimately hold caches;
    # start from a clean slate so the assertion isolates THIS operator
    spark.catalog.clearCache()
    yield spark
    spark.catalog.clearCache()


def _docs(spark):
    from lawfirm_data_pipeline_spark.io import load_table

    return load_table(spark, SF_SMOKE, "documents")


def test_name_variant_pairs_leaves_no_cache(clean_cache):
    from lawfirm_data_pipeline_spark.io import load_table
    from lawfirm_data_pipeline_spark.operators.linkage import name_variant_pairs

    part = load_table(clean_cache, SF_SMOKE, "part")
    out = name_variant_pairs(
        part, "p_name", F.split(F.col("name"), " ").getItem(1), max_dist=4
    )
    assert out.count() >= 0
    assert _cache_manager_empty(clean_cache)


def test_text_model_operators_leave_no_cache(clean_cache):
    from lawfirm_data_pipeline_spark.operators.text import (
        bigram_logprob_scores,
        tfidf_topk,
        unigram_logprob_scores,
    )

    docs = _docs(clean_cache)
    for op in (unigram_logprob_scores, bigram_logprob_scores, tfidf_topk):
        out = op(docs)
        assert out.count() > 0, op.__name__
        assert _cache_manager_empty(clean_cache), op.__name__


def test_kmeans_fixed_leaves_no_cache(clean_cache):
    from lawfirm_data_pipeline_spark.io import load_table
    from lawfirm_data_pipeline_spark.operators.clustering import kmeans_fixed

    emb = load_table(clean_cache, SF_SMOKE, "embeddings")
    out = kmeans_fixed(emb, k=8, iters=2)
    assert out.count() == 8
    assert _cache_manager_empty(clean_cache)


def test_cms_frequency_audit_leaves_no_cache(clean_cache):
    from lawfirm_data_pipeline_spark.operators.sketch import cms_frequency_audit

    out = cms_frequency_audit(_docs(clean_cache))
    assert out.count() > 0
    assert _cache_manager_empty(clean_cache)


def test_hash_bucket_negatives_leaves_no_cache(clean_cache):
    from lawfirm_data_pipeline_spark.io import load_table
    from lawfirm_data_pipeline_spark.operators.sampling import hash_bucket_negatives

    lineitem = load_table(clean_cache, SF_SMOKE, "lineitem")
    positives = lineitem.select(
        F.col("l_orderkey").alias("user_id"), F.col("l_partkey").alias("item_id")
    ).distinct()
    items = lineitem.select(F.col("l_partkey").alias("item_id"))
    out = hash_bucket_negatives(positives, items, k=2)
    assert out.count() > 0
    assert _cache_manager_empty(clean_cache)


def test_oracle_query_paths_leave_no_cache(clean_cache):
    """The full declared query paths converted in r13 (the r12 verdict's
    leak list): after a complete run nothing survives in the
    CacheManager."""
    from lawfirm_data_pipeline_spark.queries import QUERIES

    for name in (
        "q231_er_clusters",
        "q177_label_separation",
        "q178_cusum_bursts",
        "q58_unigram_logprob",
        "q117_bigram_lm",
        "q118_cms_audit",
        "q146_negative_samples",
        "q181_kmeans_clusters",
        "q129_name_variants",
        "q46_tfidf_topk",
    ):
        QUERIES[name](clean_cache, SF_SMOKE).count()
        assert _cache_manager_empty(clean_cache), name
