"""The two LSH bucket implementations (JVM expressions vs Arrow matmul)
stay interchangeable: same top-k sets on the fixed corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.operators.similarity import lsh_topk

SF = "/root/testdata/sf0.01"


def test_arrow_and_jvm_buckets_agree(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    jvm = {
        (r.query_id, r.vec_id)
        for r in lsh_topk(emb, queries, k=10, n_planes=6, n_tables=6, arrow=False).collect()
    }
    arrow = {
        (r.query_id, r.vec_id)
        for r in lsh_topk(emb, queries, k=10, n_planes=6, n_tables=6, arrow=True).collect()
    }
    # buckets can differ only where a plane dot lands exactly on 0.0
    # under different accumulation orders — effectively never on real
    # data; require (near-)identical candidate outcomes
    overlap = len(jvm & arrow) / max(len(jvm | arrow), 1)
    assert overlap >= 0.95, (len(jvm), len(arrow), overlap)
