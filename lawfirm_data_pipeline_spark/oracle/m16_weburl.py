"""M16 — URL / domain curation (charter §2.C web-crawl additions).

The ``documents`` table carries no URL column, so each query synthesizes
a deterministic messy URL as a pure function of ``doc_id`` (the q78 PII
pattern): both engines build the identical raw string, so the check
covers the full canonicalize → registrable-domain → cap/blocklist
funnel, not just row counts.

Reference parity: the reference's scrape stage keys `PlaceEntry` rows on
a unique ``url`` and filters records by geography/name substrings
(src/workflows/placesLocator/activities/extractGooglePlaces.ts:295,
src/db/schema.prisma:34); per-domain capping and blocklisting are the
web-corpus generalization of the same URL-keyed gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.weburl import (
    blocklist_filter,
    domain_cap,
    normalize_url,
    registrable_domain,
    url_host,
)
from ..queries import query

# Deterministic messy URL per doc: scheme-case variants, optional
# userinfo, mixed-case hosts, www prefixes, default port, trailing
# slash, query string, fragment — every normalization step fires on a
# known subset of rows.
_RAW_SQL = """
    CASE doc_id % 3 WHEN 0 THEN 'https://' WHEN 1 THEN 'http://' ELSE 'HTTPS://' END
    || CASE WHEN doc_id % 9 = 0 THEN 'user:pw@' ELSE '' END
    || CASE doc_id % 8 WHEN 0 THEN 'Alpha.Example.com'
            WHEN 1 THEN 'beta.example.co.uk'
            WHEN 2 THEN 'www.gamma.example.com'
            WHEN 3 THEN 'delta.test.org'
            WHEN 4 THEN 'short.io'
            WHEN 5 THEN 'zeta.sample.net'
            WHEN 6 THEN 'eta.papers.com.au'
            ELSE 'gamma.example.com' END
    || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
    || '/p/' || CAST(doc_id % 40 AS VARCHAR)
    || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END
"""

# Oracle-side mirror of operators/weburl.normalize_url +
# registrable_domain, step for step (Java-regex ∩ RE2 dialect).
_NORM_CTE = f"""
    raw AS (SELECT doc_id, {_RAW_SQL} AS r FROM documents),
    s1 AS (SELECT doc_id,
                  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                      r, '#.*$', ''), '\\?.*$', ''),
                      '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''), '^[^/@]+@', '') AS u
           FROM raw),
    s2 AS (SELECT doc_id,
                  regexp_replace(regexp_replace(
                      lower(regexp_extract(u, '^([^/]*)', 1)),
                      ':(80|443)$', ''), '^www\\.', '') AS host,
                  regexp_replace(regexp_replace(u, '^[^/]*', ''), '/+$', '') AS path
           FROM s1),
    nm AS (SELECT doc_id, host || path AS norm_url, host,
                  string_split(host, '.') AS parts,
                  len(string_split(host, '.')) AS n
           FROM s2),
    dm AS (SELECT doc_id, norm_url, host,
                  CASE WHEN n <= 2 THEN host
                       WHEN array_to_string(parts[n - 1 : n], '.')
                            IN ('co.uk', 'org.uk', 'com.au', 'co.jp', 'com.br')
                            AND n >= 3
                       THEN array_to_string(parts[n - 2 : n], '.')
                       ELSE array_to_string(parts[n - 1 : n], '.') END AS domain
           FROM nm)
"""


def _with_url_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    raw: Column = F.concat(
        F.when(did % 3 == 0, F.lit("https://"))
        .when(did % 3 == 1, F.lit("http://"))
        .otherwise(F.lit("HTTPS://")),
        F.when(did % 9 == 0, F.lit("user:pw@")).otherwise(F.lit("")),
        F.when(did % 8 == 0, F.lit("Alpha.Example.com"))
        .when(did % 8 == 1, F.lit("beta.example.co.uk"))
        .when(did % 8 == 2, F.lit("www.gamma.example.com"))
        .when(did % 8 == 3, F.lit("delta.test.org"))
        .when(did % 8 == 4, F.lit("short.io"))
        .when(did % 8 == 5, F.lit("zeta.sample.net"))
        .when(did % 8 == 6, F.lit("eta.papers.com.au"))
        .otherwise(F.lit("gamma.example.com")),
        F.when(did % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"),
        (did % 40).cast("string"),
        F.when(did % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            did % 2 == 0,
            F.concat(F.lit("?utm_source=feed&id="), did.cast("string")),
        ).otherwise(F.lit("")),
        F.when(did % 6 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )
    norm = normalize_url(raw)
    host = url_host(norm)
    return docs.select(
        "doc_id",
        norm.alias("norm_url"),
        host.alias("host"),
        registrable_domain(host).alias("domain"),
    )


# -- q87: URL canonicalization + registrable domain
@query(
    "q87_url_canonicalize",
    f"WITH {_NORM_CTE} SELECT doc_id, norm_url, host, domain FROM dm",
)
def q87_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical URL, host, and eTLD+1 per document.  Pure scan-side
    regexp/array projections — whole-stage codegen, zero shuffle, zero
    Python (operators/weburl.py)."""
    return _with_url_cols(spark, sf_dir)


# -- q88: per-domain document cap
@query(
    "q88_domain_cap",
    f"""
    WITH {_NORM_CTE},
    r AS (SELECT doc_id, domain,
                 row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS domain_rank
          FROM dm)
    SELECT doc_id, domain, CAST(domain_rank AS INT) AS domain_rank
    FROM r WHERE domain_rank <= 20
    """,
)
def q88_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep ≤20 docs per registrable domain, oldest doc_id first.  One
    row_number window keyed on the domain; a mega-domain is a single
    sorted-spilled partition, never an OOM (operators/weburl.domain_cap)."""
    capped = domain_cap(_with_url_cols(spark, sf_dir), cap=20, id_col="doc_id")
    return capped.select("doc_id", "domain", F.col("domain_rank").cast("int"))


# -- q89: domain blocklist filter
@query(
    "q89_domain_blocklist",
    f"""
    WITH {_NORM_CTE}
    SELECT domain, CAST(count(*) AS BIGINT) AS n_docs
    FROM dm WHERE domain NOT IN ('example.co.uk', 'sample.net')
    GROUP BY domain
    """,
)
def q89_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving doc counts per domain after dropping blocklisted
    domains.  The literal blocklist compiles to a codegen'd NOT-isin
    hash probe — no join, no shuffle beyond the count agg
    (operators/weburl.blocklist_filter)."""
    kept = blocklist_filter(
        _with_url_cols(spark, sf_dir), ["example.co.uk", "sample.net"]
    )
    return kept.groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs"))
