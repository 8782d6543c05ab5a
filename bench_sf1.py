"""sf1 spot-bench of the heaviest queries (r4 verdict #5).

The driver ships sf0.001/0.01/0.1 only, so the one-decade scaling
signal (sf0.01 → sf0.1) can hide quadratic creep between decades.
This script materializes an sf1 replica — ten key-shifted copies of
the sf0.1 tables, offsets chosen so referential integrity survives and
copies never collide.  Registry filter moduli (7, 11, 13, 29, 37, ...)
do NOT all divide the offsets, so each copy selects a somewhat
different row subset — distributions are only APPROXIMATELY preserved
(r5 ADVICE).  That is fine for what this measures: slope of runtime in
data volume (NOT the driver's generator; never a correctness oracle) —
then times the heaviest registry queries at sf0.1 AND sf1 and prints
one JSON line with per-query times and the time-vs-sf slope
(t_sf1 / t_sf0.1; linear-scan queries ≲ 10, constant-overhead
queries ≈ 1, anything ≫ 10 is super-linear and a scale bug).

Usage:  python bench_sf1.py            # materializes benchdata/sf1 on
                                       # first run (~170 MB), then times
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.session import get_spark

_REPO = os.path.dirname(os.path.abspath(__file__))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(_REPO, "benchdata", "sf1")

# key columns shifted by copy_index * offset; offset per table chosen
# >> max key so copies never collide and joins stay within one copy
_SHIFTS = {
    "customer": {"c_custkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 10_000_000,
    },
    "part": {"p_partkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "events": {"event_id": 1_000_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
    "nation": None,  # dimension: copy once
    "region": None,
}

HEAVY = [
    "q244_bmp_decode",
    "q242_python_stream_source",
    "q210_reshard_audit",
    "q127_triangle_count",
    "q146_negative_samples",
    "q231_er_clusters",
    "q259_deletion_vectors",
    "q164_rec_precision",
    "q128_pagerank",
    "q224_multi_table_transaction",
    "q270_pipeline_composite",
    # r5 verdict #4: every query >1.5 s in the r5 sweep that had no
    # measured slope — the post-M91 heavies and the mid-registry tail.
    "q292_gbdt_stumps",
    "q293_naive_bayes_langid",
    "q279_greedy_wordpiece",
    "q280_bucketed_join_revenue",
    "q282_incremental_minhash",
    "q133_prefix_jaccard",
    "q142_association_rules",
    "q185_source_overlap",
    "q186_knn_label_noise",
    # r6: >1.5 s solo in the round-6 quiet measurements, no slope yet
    "q221_textrank_keywords",
    "q239_kmv_union",
    "q181_kmeans_clusters",
    "q38_lsh_ann_topk",
    # r6 close: every remaining >1.5 s in-sweep query without a slope row
    # (four are real readStream gates — expected slope ≈ trigger overhead)
    "q225_semantic_dedup",
    "q38b_lsh_ann_exhaustive",
    "q183_bloom_semijoin",
    "q283_watermark_drop",
    "q232_stream_restart_recovery",
    "q276_write_audit_publish",
    "q277_stream_backpressure",
    "q104_stream_stream_join",
    "q97_corpus_pipeline",
    "q110_stateful_totals",
    "q117_bigram_lm",
    "q123_token_drift",
    "q106_boilerplate_filter",
    "q37_embedding_neardup",
    "q125_pca_audit",
    "q103_cross_source_overlap",
]


SF3 = os.path.join(_REPO, "benchdata", "sf3")

# r6 verdict #4: one measured decade (sf0.1 -> sf1) can hide an n^1.5
# term a second measurement point cannot — for the slope>2.4 tail we
# add an sf3 replica (30 shifted copies) and check the sf1 -> sf3
# ratio against the shape bound: linear => ~3, n^1.5 => ~5.2, n^2 => 9.
STEEP = [
    "q127_triangle_count",
    "q210_reshard_audit",
    "q110_stateful_totals",
    "q146_negative_samples",
    "q164_rec_precision",
]


def _perturb_copy(c, table: str, k: int, dim: int):
    """Per-copy ORTHOGONAL embedding map (r7 verdict #3): cyclic
    coordinate rotation + a deterministic ±1 sign pattern.  Within one
    copy every pairwise cosine is exactly preserved (one orthogonal map
    per copy), so each copy carries the same planted near-dup structure
    as the original — but a vector and its key-shifted twin in another
    copy stop being near-duplicates (expected cross-copy cosine 0 ±
    1/sqrt(dim)), which is what an ORGANIC n-times corpus looks like.
    Without this, sf3 held 30 verbatim copies of every embedding and
    q225's bucket collision density grew with the copy count by
    construction (BASELINE.md tier-2 note), polluting the slope with a
    replica artifact.  k=0 stays the identity so sf0.1 ⊂ sf1 ⊂ sf3."""
    if k == 0 or table not in ("embeddings", "documents"):
        return c
    if table == "documents":
        # Same organic-growth argument for TEXT: suffix every token
        # with the copy index.  Token equality WITHIN a copy is
        # untouched (all within-copy shingle/Jaccard/minhash structure
        # preserved exactly), but cross-copy token sets become
        # disjoint, so key-shifted copies stop being exact/near
        # duplicates of each other — verbatim text copies made every
        # text-hash bucket's density grow with the copy count.
        return c.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", rf"$1⦙{k}")
        )
    import random as _random

    rng = _random.Random(9176 + k)
    signs = [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
    rot = (7 * k) % dim
    v = F.concat(F.slice("embedding", rot + 1, dim - rot), F.slice("embedding", 1, rot))
    sign_arr = F.array(*[F.lit(s) for s in signs])
    return c.withColumn(
        "embedding",
        F.zip_with(v, sign_arr, lambda a, s: (a * s).cast("float")),
    )


def materialize(spark, root: str | None = None, factor: int = 10) -> None:
    root = root or SF1
    os.makedirs(root, exist_ok=True)
    for table, shifts in _SHIFTS.items():
        dst = os.path.join(root, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        src = spark.read.parquet(os.path.join(SF01, f"{table}.parquet"))
        if shifts is None:
            out = src
        else:
            dim = (
                len(src.select("embedding").head()[0])
                if table == "embeddings"
                else 0
            )
            copies = []
            for k in range(factor):
                c = src
                for col, off in shifts.items():
                    c = c.withColumn(
                        col, (F.col(col) + F.lit(k * off)).cast(src.schema[col].dataType)
                    )
                copies.append(_perturb_copy(c, table, k, dim))
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        out.write.mode("overwrite").parquet(dst)
        print(f"materialized {table}", flush=True)


def _probe_prefix_jaccard_scaled(spark, sf_dir: str):
    """sf-SCALED planted near-dup corpus (r7 verdict #4): q133's
    registry query runs on the FIXED 150-doc planted corpus — its
    quadratic all-pairs SQL oracle requires the bound — so its
    workload cannot scale with sf_dir and it had no slope row.  This
    probe rebuilds the identical plant over the WHOLE documents table
    (every 10th doc re-enters with its first token stripped), so
    planted pairs ∝ sf and prefix-filter Jaccard gets a real
    two-decade measurement of the operator itself."""
    from lawfirm_data_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10_000_000_000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+\s+", "").alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(near)
    return prefix_filter_jaccard_pairs(corpus, threshold_num=4, threshold_den=5, n=3)


# Slope probes: operator workloads that genuinely scale with sf_dir
# where the registry query's own input is bounded by its oracle.
PROBES = {"probe_prefix_jaccard_scaled": _probe_prefix_jaccard_scaled}


def main() -> None:
    import sys

    import __spark_entry__ as entrymod

    argv = sys.argv[1:]
    sf3_mode = "--sf3" in argv
    if sf3_mode:
        argv = [a for a in argv if a != "--sf3"]
        # q127's adjacency localCheckpoint OOMs the default 8g heap at
        # sf3; size the driver before the JVM exists (no-op if the env
        # already pins it)
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

    spark = get_spark()
    materialize(spark)
    qs = entrymod.queries()
    # optional args: time exactly the NAMED queries (any registry entry,
    # not just the HEAVY list); no args = the standing HEAVY list, or
    # with --sf3 the STEEP list timed at sf1 AND sf3 for the
    # second-decade slope (r6 verdict #4).
    names = argv or (STEEP if sf3_mode else HEAVY)
    tiers = [("sf0.1", SF01), ("sf1", SF1)]
    if sf3_mode:
        materialize(spark, SF3, factor=30)
        tiers.append(("sf3", SF3))
    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs.get(name) or PROBES.get(name)
        if fn is None:
            print(f"# skipping unknown query {name}", flush=True)
            continue
        times = {}
        for sf_label, sf_dir in tiers:
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).collect()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            times[sf_label] = round(best, 3)
        times["slope"] = round(times["sf1"] / max(times["sf0.1"], 1e-9), 2)
        if sf3_mode:
            # 3x data: linear => ~3, n^1.5 => ~5.2, n^2 => ~9
            times["slope_sf1_sf3"] = round(
                times["sf3"] / max(times["sf1"], 1e-9), 2
            )
        results[name] = times
        print(f"{name}: {times}", flush=True)
    print(json.dumps({"metric": "sf1_spot_bench", "queries": results}))


if __name__ == "__main__":
    main()
