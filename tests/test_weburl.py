"""Unit tests for URL/domain curation operators (operators/weburl.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.weburl import (
    blocklist_filter,
    domain_cap,
    normalize_url,
    registrable_domain,
    url_host,
)


def _norm_one(spark, raw: str) -> str:
    df = spark.createDataFrame([Row(u=raw)])
    return df.select(normalize_url("u").alias("n")).first()["n"]


def test_normalize_url_full_mess(spark):
    assert (
        _norm_one(spark, "HTTPS://user:pw@WWW.Example.COM:443/a/b/?q=1#frag")
        == "example.com/a/b"
    )


def test_normalize_url_cases(spark):
    cases = {
        "http://example.com": "example.com",
        "example.com/x": "example.com/x",  # scheme-less passes through
        "https://example.com:8080/x": "example.com:8080/x",  # non-default port kept
        "https://sub.www-site.com/p///": "sub.www-site.com/p",
        "ftp://files.example.org/pub": "files.example.org/pub",
    }
    for raw, want in cases.items():
        assert _norm_one(spark, raw) == want, raw


def test_normalize_idempotent(spark):
    raws = [
        Row(u="HTTPS://user:pw@WWW.Example.COM:443/a/b/?q=1#f"),
        Row(u="http://a.co.uk/x/"),
        Row(u="https://short.io"),
    ]
    df = spark.createDataFrame(raws)
    once = df.select(normalize_url("u").alias("n"))
    twice = once.select(normalize_url("n").alias("n"))
    assert [r["n"] for r in once.collect()] == [r["n"] for r in twice.collect()]


def test_registrable_domain(spark):
    cases = {
        "a.b.example.com": "example.com",
        "x.example.co.uk": "example.co.uk",
        "deep.sub.site.com.au": "site.com.au",
        "short.io": "short.io",
        "localhost": "localhost",
    }
    df = spark.createDataFrame([Row(h=h) for h in cases])
    got = {
        r["h"]: r["d"]
        for r in df.select("h", registrable_domain("h").alias("d")).collect()
    }
    assert got == cases


def test_url_host(spark):
    df = spark.createDataFrame([Row(n="example.com/a/b"), Row(n="x.io")])
    hosts = [r["h"] for r in df.select(url_host("n").alias("h")).collect()]
    assert sorted(hosts) == ["example.com", "x.io"]


def test_domain_cap_bound_and_deterministic(spark):
    rows = [
        Row(doc_id=i, domain="big.com" if i < 50 else f"d{i}.com")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows)
    capped = domain_cap(df, cap=5, id_col="doc_id")
    per = {
        r["domain"]: r["n"]
        for r in capped.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert per["big.com"] == 5
    # oldest ids win under the default ordering
    kept_big = sorted(
        r["doc_id"] for r in capped.filter(F.col("domain") == "big.com").collect()
    )
    assert kept_big == [0, 1, 2, 3, 4]
    assert capped.filter(F.col("domain_rank") > 5).count() == 0


def test_blocklist_literal_and_dataframe(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, domain=d) for i, d in enumerate(["a.com", "b.com", "c.com"])]
    )
    lit_kept = blocklist_filter(docs, ["b.com"])
    assert sorted(r["domain"] for r in lit_kept.collect()) == ["a.com", "c.com"]

    bl = spark.createDataFrame([Row(domain="b.com"), Row(domain="zzz.com")])
    df_kept = blocklist_filter(docs, bl)
    assert sorted(r["domain"] for r in df_kept.collect()) == ["a.com", "c.com"]
    # DataFrame variant must stay a broadcast anti-join: the corpus side
    # never shuffles.
    plan = df_kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_blocklist_empty_noop(spark):
    docs = spark.createDataFrame([Row(doc_id=1, domain="a.com")])
    assert blocklist_filter(docs, []).count() == 1


def test_domain_cap_two_phase_equals_single_window_under_skew(spark):
    """The skew-safe two-phase plan must pick the EXACT same survivors
    and ranks as the single-window form, regardless of input
    partitioning, on a corpus with a mega-domain (80% of rows)."""
    from pyspark.sql import functions as F

    from lawfirm_data_pipeline_spark.operators.weburl import domain_cap

    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "mega.com")
        .otherwise(F.concat(F.lit("d"), (F.col("id") % 37).cast("string")))
        .alias("domain"),
    )
    a = sorted(tuple(r) for r in domain_cap(docs, 5, two_phase=True).collect())
    b = sorted(
        tuple(r) for r in domain_cap(docs.repartition(13), 5, two_phase=True).collect()
    )
    c = sorted(tuple(r) for r in domain_cap(docs, 5, two_phase=False).collect())
    assert a == b == c
    # every domain capped at 5
    per = {}
    for _, dom, _rank in a:
        per[dom] = per.get(dom, 0) + 1
    assert max(per.values()) <= 5 and per["mega.com"] == 5
