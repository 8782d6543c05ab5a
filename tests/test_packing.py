"""Sequence packing, mixture sampling, passage dedup — unit + plan
shape.  The differential gate (test_oracle_queries q81-q84) proves
values; these pin the operator-level contracts and the scale property
that motivates the two-phase prefix sum."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.operators.dedup import (
    drop_duplicate_passages,
    passage_dedup_stats,
)
from lawfirm_data_pipeline_spark.operators.packing import (
    exclusive_prefix_sum,
    order_key,
    pack_sequences,
    shard_assignments,
)
from lawfirm_data_pipeline_spark.operators.sampling import mixture_sample

from .conftest import SF_SMOKE
from .test_plans import plan_of


def test_prefix_sum_matches_naive_global_window(spark):
    """Two-phase bucketed scan ≡ the single-partition global window."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", order_key("doc_id").alias("k"), F.length("text").alias("v")
    )
    got = {
        r["doc_id"]: r["tok_offset"]
        for r in exclusive_prefix_sum(docs, "v", "k").collect()
    }
    rows = sorted(docs.collect(), key=lambda r: r["k"])
    acc = 0
    for r in rows:
        assert got[r["doc_id"]] == acc
        acc += r["v"]


def test_pack_sequences_is_gapless_partition(spark):
    """Offsets tile [0, total_tokens) exactly: no gaps, no overlaps."""
    docs = load_table(spark, SF_SMOKE, "documents")
    rows = sorted(
        pack_sequences(docs, ctx_len=128).collect(), key=lambda r: r["tok_offset"]
    )
    acc = 0
    for r in rows:
        assert r["tok_offset"] == acc
        assert r["seq_first"] == acc // 128
        assert r["seq_last"] == (acc + r["n_tok"] - 1) // 128
        acc += r["n_tok"]


def test_pack_big_window_is_partitioned(spark):
    """The corpus-sized window must be partition-parallel: every Window
    node over more than the 256-row bucket table carries a partition
    spec.  (A bare ``Window.orderBy`` over the corpus is the plan this
    operator exists to avoid.)"""
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = plan_of(pack_sequences(docs, ctx_len=512))
    win_lines = [ln for ln in plan.splitlines() if "Arguments:" in ln and "windowspecdefinition" in ln]
    assert win_lines, "expected Window nodes in plan"
    partitioned = [ln for ln in win_lines if "_pb" in ln.split("windowspecdefinition")[1][:80]]
    # exactly one unpartitioned window (the 256-row bucket-offset table)
    assert len(win_lines) - len(partitioned) <= 1


def test_mixture_sample_respects_budget_and_floor(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    kept = mixture_sample(
        docs, "doc_id", "source", F.col("n_chars"), budget_frac=0.5
    )
    tot = docs.agg(F.sum("n_chars")).collect()[0][0]
    kept_tot = kept.agg(F.sum("n_chars")).collect()[0][0]
    # hash thresholding lands near the budget, never wildly above
    assert kept_tot <= 0.7 * tot
    # every observed stratum survives (uniform target upweights small ones)
    assert kept.select("source").distinct().count() == docs.select(
        "source"
    ).distinct().count()


def test_mixture_sample_explicit_weights_drop_zero_weight_strata(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    kept = mixture_sample(
        docs,
        "doc_id",
        "source",
        F.col("n_chars"),
        budget_frac=0.3,
        weights={"src0": 1.0, "src1": 1.0},
    )
    srcs = {r["source"] for r in kept.select("source").distinct().collect()}
    assert srcs <= {"src0", "src1"}


def test_passage_dedup_repair_consistent_with_stats(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    stats = {
        r["doc_id"]: r for r in passage_dedup_stats(docs, passage_tokens=16).collect()
    }
    repaired = {
        r["doc_id"]: r
        for r in drop_duplicate_passages(docs, passage_tokens=16).collect()
    }
    assert stats, "expected non-empty corpus"
    for did, s in stats.items():
        n_kept = s["n_passages"] - s["n_dup_passages"]
        if n_kept == 0:
            assert did not in repaired
        else:
            assert repaired[did]["n_kept_passages"] == n_kept
    # at least one duplicated passage exists in the synthetic corpus
    assert any(s["n_dup_passages"] > 0 for s in stats.values())


def test_passage_dedup_no_cartesian_no_bnlj(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = plan_of(passage_dedup_stats(docs, passage_tokens=32))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_shard_assignments_balance_bytes(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    sharded = shard_assignments(docs, n_shards=4, size_col="n_chars", key_col="doc_id")
    per = sorted(
        (r["shard"], r["b"])
        for r in sharded.groupBy("shard").agg(F.sum("n_chars").alias("b")).collect()
    )
    assert [s for s, _ in per] == [0, 1, 2, 3]
    sizes = [b for _, b in per]
    # contiguous byte-range sharding: within one max-row-size of ideal
    max_row = docs.agg(F.max("n_chars")).collect()[0][0]
    ideal = sum(sizes) / 4
    assert all(abs(b - ideal) <= max_row + ideal / 4 for b in sizes)
    # assignment is deterministic across recomputation
    again = {
        (r["doc_id"], r["shard"])
        for r in shard_assignments(
            docs, n_shards=4, size_col="n_chars", key_col="doc_id"
        ).select("doc_id", "shard").collect()
    }
    assert {(r["doc_id"], r["shard"]) for r in sharded.select("doc_id", "shard").collect()} == again


def test_table_diff_classifies_and_drops_unchanged(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "source", "n_chars")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 4 != 0).withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 5 == 0, F.col("n_chars") + 1).otherwise(
            F.col("n_chars")
        ),
    )
    from lawfirm_data_pipeline_spark.operators.cdc import table_diff

    got = {r["doc_id"]: r["change"] for r in table_diff(old, new, ["doc_id"]).collect()}
    n = docs.count()
    for i in range(n):
        in_old = i % 3 != 0
        in_new = i % 4 != 0
        if in_old and not in_new:
            assert got[i] == "delete"
        elif in_new and not in_old:
            assert got[i] == "insert"
        elif in_old and in_new and i % 5 == 0:
            assert got[i] == "update"
        else:
            assert i not in got
