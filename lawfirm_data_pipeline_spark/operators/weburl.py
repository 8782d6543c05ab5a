"""URL / domain curation operators for web-crawl corpora.

A crawl-derived training corpus is curated per-URL before per-document
text analysis ever runs: canonicalize URLs (so the same page fetched via
http/https/www/query-string variants dedups), reduce hosts to their
registrable domain (the policy unit for caps and blocklists), cap
documents per domain (one mega-site must not dominate the mixture), and
drop blocklisted domains.

Scale posture:

* ``normalize_url`` / ``url_host`` / ``registrable_domain`` are pure
  scan-side string projections — JVM codegen, no shuffle, no Python.
  Written in the Java-regex ∩ RE2 dialect so the DuckDB oracle twin is
  exact.
* ``domain_cap`` is one ``row_number`` window partitioned by domain.
  The shuffle key is the registrable domain; a mega-domain is one
  partition's worth of rows, bounded by sorting only within the
  partition (Spark spills window sorts to disk — no OOM, and AQE skew
  handling splits oversized partitions).  The ordering key is explicit
  and deterministic, so the kept set is stable across runs and engines.
* ``blocklist_filter`` keeps the blocklist driver-side as a literal
  ``isin`` when small (codegen'd hash set, no join at all) — the right
  plan for the common case of a few thousand domains.  For a huge
  blocklist, pass a DataFrame and it becomes a broadcast anti-join.

Reference parity: the reference excludes records by geography/name
rules during scraping (src/services/scraper.ts — nationwide-row and
excluded-place filters); domain blocklisting is the web-corpus
generalization of the same gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-part public suffixes recognized by ``registrable_domain``.  A
# production pipeline ships the full public-suffix list as a broadcast
# lookup; the operator's logic is identical — only the table grows.
MULTI_PART_SUFFIXES = ("co.uk", "org.uk", "com.au", "co.jp", "com.br")

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"
_CRED_RE = r"^[^/@]+@"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_url(url: Column | str) -> Column:
    """Canonical URL: strip fragment, query string, scheme, credentials,
    default ports and a leading ``www.``; lowercase the host; drop
    trailing slashes from the path.

    Every step is a regexp projection in the dialect both Java regex and
    RE2 accept (no lookaround, no backreferences), so the operator is
    bit-reproducible across engines.
    """
    u = _c(url)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"\?.*$", "")  # query string
    u = F.regexp_replace(u, _SCHEME_RE, "")  # scheme
    u = F.regexp_replace(u, _CRED_RE, "")  # userinfo
    host = F.lower(F.regexp_extract(u, r"^([^/]*)", 1))
    host = F.regexp_replace(host, r":(80|443)$", "")  # default ports
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(u, r"^[^/]*", "")
    path = F.regexp_replace(path, r"/+$", "")  # trailing slashes
    return F.concat(host, path)


def url_host(norm_url: Column | str) -> Column:
    """Host part of an already-normalized URL (everything before ``/``)."""
    return F.regexp_extract(_c(norm_url), r"^([^/]*)", 1)


def registrable_domain(host: Column | str) -> Column:
    """eTLD+1: the last two host labels, or three when the last two form
    a known multi-part public suffix (``a.b.co.uk`` → ``b.co.uk``).

    Pure array arithmetic over ``split`` — no UDF.  Hosts with fewer
    labels than the suffix demands pass through unchanged.
    """
    h = _c(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(parts, -3),
        F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    is_multi = last2.isin(*MULTI_PART_SUFFIXES)
    return (
        F.when(n <= 2, h)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def domain_cap(
    docs: DataFrame,
    cap: int,
    domain_col: str = "domain",
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    two_phase: bool = True,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, best-first.

    ``order_by`` defaults to ascending ``id_col`` (oldest/first-crawled
    wins); pass e.g. ``[F.col("quality").desc(), F.col("doc_id")]`` to
    keep the highest-quality pages.  The ordering MUST be total (include
    a unique tiebreaker) or the kept set is nondeterministic under
    repartitioning — the default appends ``id_col`` for that reason.
    Adds a ``domain_rank`` column (1-based) to the survivors.

    ``two_phase=True`` (default) is the skew-safe shape: a web corpus
    always has mega-domains (a domain holding 1% of 100 TB would pin a
    single window partition).  Phase 1 ranks within (domain, input
    split) — the mega-domain's rows stay spread across splits — and
    keeps each split's local top-``cap``; phase 2 ranks the surviving
    ≤ cap x n_splits rows per domain.  Both phases pick identical
    survivors to the single-window form because any row in the global
    top-cap of its domain is necessarily in the top-cap of its split.
    """
    from pyspark.sql import Window

    order = list(order_by) if order_by else []
    order.append(F.col(id_col).asc())
    w = Window.partitionBy(domain_col).orderBy(*order)
    if not two_phase:
        return (
            docs.withColumn("domain_rank", F.row_number().over(w))
            .filter(F.col("domain_rank") <= cap)
        )
    w_local = Window.partitionBy(domain_col, "__split").orderBy(*order)
    local = (
        docs.withColumn("__split", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= cap)
        .drop("__split", "__lr")
    )
    return (
        local.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= cap)
    )


def blocklist_filter(
    docs: DataFrame,
    blocklist: list[str] | DataFrame,
    domain_col: str = "domain",
) -> DataFrame:
    """Drop documents whose domain is blocklisted.

    A literal list compiles to a codegen'd ``NOT isin`` hash probe — no
    join, no shuffle.  A DataFrame blocklist (one ``domain`` column)
    becomes a broadcast left-anti join: the 100 TB side never shuffles.
    """
    if isinstance(blocklist, DataFrame):
        return docs.join(
            F.broadcast(blocklist.select(F.col("domain").alias(domain_col))),
            on=domain_col,
            how="left_anti",
        )
    if not blocklist:
        return docs
    return docs.filter(~F.col(domain_col).isin(*blocklist))
