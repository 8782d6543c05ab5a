"""Unit tests for epoch shuffle and the PCA spectrum audit."""

from __future__ import annotations

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.operators.sampling import epoch_shuffle
from lawfirm_data_pipeline_spark.operators.stats import pca_explained_variance

from .test_plans import plan_of

SF = "/root/testdata/sf0.01"


def test_epoch_shuffle_positions_contiguous_per_shard(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    out = epoch_shuffle(docs, epoch=3, n_shards=4).collect()
    assert len(out) == docs.count()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))


def test_epoch_shuffle_deterministic_and_epoch_dependent(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    a = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(docs, epoch=1).collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(docs.repartition(9), epoch=1).collect()}
    c = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(docs, epoch=2).collect()}
    assert a == b        # pure function of (epoch, key)
    assert a != c        # epochs are independent permutations


def test_epoch_shuffle_no_global_sort(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    plan = plan_of(epoch_shuffle(docs, epoch=1, n_shards=8))
    # window partitions by shard -> hash exchange, never a range
    # exchange (the global-sort signature)
    assert "rangepartitioning" not in plan.lower()


def test_pca_audit_verdicts_true(spark):
    emb = load_table(spark, SF, "embeddings")
    r = pca_explained_variance(emb, dim=64).first()
    assert r.n_components == 64
    assert r.trace > 0
    assert r.trace_matches_eigsum and r.ratios_in_bounds and r.ratios_sum_ok
