"""Tests for the m48 Spark-4-native surfaces: connector partition
planning, UDTF vs JVM n-grams, variant vs string-path JSON."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_datasource_partitions_per_seed(spark):
    from lawfirm_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    df = spark.read.format("paged_demo").option("seeds", "5").load()
    # one planned partition per seed — the external-fetch parallelism
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    want = [
        (s, p, i, s * 1000 + p * 10 + i)
        for s in range(5)
        for p in range(pydatasource.n_pages(s))
        for i in range(3)
    ]
    assert sorted(tuple(r) for r in rows) == sorted(want)


def test_datasource_max_pages_cap(spark):
    from lawfirm_data_pipeline_spark.sources import pydatasource

    pydatasource.register(spark)
    df = spark.read.format("paged_demo").option("seeds", "6").option(
        "max_pages", "1"
    ).load()
    # the A23-style bound: every seed truncated to one page
    assert df.count() == 6 * 3
    assert df.agg(F.max("page")).collect()[0][0] == 0


def test_udtf_bigrams_match_jvm_shingles(spark):
    from lawfirm_data_pipeline_spark.operators.text import shingles_of, tokenized

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, ngram string")
    class Bigrams:
        def eval(self, doc_id, text):
            toks = [t for t in (text or "").lower().split() if t]
            for i in range(len(toks) - 1):
                yield doc_id, toks[i] + " " + toks[i + 1]

    spark.udtf.register("bigrams_t_test", Bigrams)
    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < 50
    )
    docs.select("doc_id", "text").createOrReplaceTempView("t_docs")
    via_udtf = spark.sql(
        "SELECT t.doc_id, t.ngram FROM t_docs d,"
        " LATERAL bigrams_t_test(d.doc_id, d.text) t"
    )
    via_jvm = tokenized(docs).select(
        "doc_id", F.explode(shingles_of(F.col("toks"), 2)).alias("ngram")
    )
    assert via_udtf.exceptAll(via_jvm).count() == 0
    assert via_jvm.exceptAll(via_udtf).count() == 0


def test_variant_matches_string_path(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    via_variant = ev.select(
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k")
    )
    via_string = ev.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
    assert via_variant.exceptAll(via_string).count() == 0
    assert via_string.exceptAll(via_variant).count() == 0
