"""BM25 scoring / top-k retrieval over the document corpus.

A training-data pipeline retrieves by lexical relevance constantly —
decontamination lookups, RAG-context mining, eval-set neighbor pulls.
This is the classic inverted-index score expressed as a Catalyst plan:

* tokenize once per doc (`text.tokenized`), explode, and filter to the
  query's term set FIRST — the shuffle only ever carries rows whose term
  matches, so corpus size drops out of the exchange immediately;
* document frequencies and IDFs aggregate from the matched rows (a
  ``|terms|``-row table — broadcast back, never shuffled);
* per-(doc, term) partial scores snap to nano-fixed-point BIGINTs before
  the per-doc sum, making the aggregation an exact integer sum —
  order-independent under any partitioning, reproducible in ANSI SQL
  (same discipline as ``text.unigram_logprob_scores``).

Scale shape: one explode+filter scan, one shuffle on doc id for the
per-doc combine, two broadcast joins (IDF table, corpus constants).  No
step is proportional to |corpus| x |vocabulary|.

Reference parity: the reference has no retrieval operator — charter
addition (SURVEY.md §2.C) alongside dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokenized
from lawfirm_data_pipeline_spark.functions.rounding import bfround

_FP = int(1e9)  # nano fixed-point: exact integer accumulation of scores


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 score of every document against a fixed term set.

    Returns (id, score) for documents matching >= 1 term; ``score`` is
    rounded to 6 decimals after exact fixed-point accumulation, so it
    hash-matches an ANSI-SQL twin at any parallelism.
    """
    tok = tokenized(docs, text_col=text_col, id_col=id_col)
    # doc length table + corpus constants (one tiny row, broadcast).
    # NOTE on the 5-scan lazy plan: consts and tf are each referenced
    # twice (directly + through idf), so the lazy plan re-derives the
    # tokenize+explode lineage per reference.  Deliberately NOT
    # materialized: A/B at sf0.1 measured plain-lazy 0.94 s vs persist()
    # 1.09 s vs eager checkpoint 1.21 s — re-scanning a small corpus is
    # cheaper than cache/job management.  At production scale the tf and
    # dl tables are PRE-BUILT index artifacts (write once, query many),
    # which removes the duplication without per-query materialization.
    dl = tok.select(F.col(id_col), F.size("toks").alias("dl"))
    consts = dl.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    )
    # term frequencies for query terms only — the isin filter prunes the
    # exploded stream before any exchange
    tf = (
        tok.select(F.col(id_col), F.explode("toks").alias("w"))
        .filter(F.col("w").isin(list(query_terms)))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # document frequency per term -> IDF (|terms| rows; broadcast back)
    idf = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(consts))
        .select(
            "w",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    scored = (
        tf.join(dl, id_col)
        .crossJoin(F.broadcast(consts))
        .join(F.broadcast(idf), "w")
        .select(
            F.col(id_col),
            # avgdl from exact integer sum/count -> one deterministic division
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (
                        1
                        - b
                        + b
                        * F.col("dl")
                        / (F.col("sum_dl").cast("double") / F.col("n_docs"))
                    )
                )
            ).alias("term_score"),
        )
        # snap per-term score to fixed point BEFORE summing: exact ints
        .select(id_col, bfround(F.col("term_score") * _FP).cast("long").alias("s_fp"))
        .groupBy(id_col)
        .agg(F.sum("s_fp").alias("s_fp"))
    )
    return scored.select(
        id_col, bfround(F.col("s_fp").cast("double") / _FP, 6).alias("score")
    )


def positional_postings(
    docs: DataFrame,
    terms: list[str] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional inverted-index postings: one row per (term, doc, pos).

    ``terms`` restricts the postings to a term set BEFORE any exchange —
    for phrase queries only the phrase's own words ever shuffle, so the
    cost tracks term selectivity, not corpus size.  ``pos`` is the
    0-based token offset (the token stream is the engine-wide
    lowercase/whitespace convention).
    """
    tok = tokenized(docs, text_col=text_col, id_col=id_col)
    posts = tok.select(
        F.col(id_col), F.posexplode("toks").alias("pos", "term")
    )
    if terms is not None:
        posts = posts.filter(F.col("term").isin(list(terms)))
    return posts.select("term", id_col, "pos")


def phrase_match_counts(
    docs: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase occurrence counts per document via positional-
    postings adjacency joins — the standard inverted-index phrase plan.

    The first word's postings anchor the match; each subsequent word
    joins on ``(doc, pos + offset)``.  Every join side is pre-filtered
    to a single term, so these are joins between two slivers of the
    postings list, and the join key (doc, pos) is unique per side — no
    fan-out.  Returns ``(id, n_matches)`` for documents containing the
    phrase at least once.

    Scale: one tokenize+posexplode scan with term filter pushed below
    the exchange, then |phrase|-1 equi-joins on (doc, pos) — each
    shuffles only that term's postings.  A phrase of stopwords degrades
    to the hot-token case; partial aggregation still collapses the
    final per-doc count map-side.
    """
    if len(phrase) < 2:
        raise ValueError("phrase_match_counts needs >= 2 words")
    posts = positional_postings(docs, terms=list(set(phrase)), text_col=text_col, id_col=id_col)
    anchor = (
        posts.filter(F.col("term") == phrase[0])
        .select(F.col(id_col), F.col("pos").alias("p0"))
    )
    for i, w in enumerate(phrase[1:], start=1):
        nxt = posts.filter(F.col("term") == w).select(
            F.col(id_col), (F.col("pos") - i).alias("p0")
        )
        anchor = anchor.join(nxt, [id_col, "p0"])
    return anchor.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_matches"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k by BM25 with a total tie-break (score desc, id asc), so the
    cut is deterministic on both engines.  The global sort runs on the
    scored subset (docs matching >= 1 term), and Spark's sort-limit is a
    per-partition top-k + driver merge of k-row heads — no full sort at
    scale."""
    scored = bm25_scores(docs, query_terms, k1=k1, b=b, text_col=text_col, id_col=id_col)
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
