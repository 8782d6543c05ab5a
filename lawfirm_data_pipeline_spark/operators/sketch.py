"""Sketch-based frequency operators: distributed Misra-Gries heavy
hitters with an exact verification pass.

Charter addition (SURVEY §2.C) over the ``documents`` table.  The
reference has no frequency analytics at all (its only aggregation is
Prisma ``count``/``groupBy``); a pretraining-data pipeline needs
"which tokens/domains/templates dominate the corpus" answers WITHOUT
shuffling every token occurrence at 100 TB.

Scale posture — the whole point of this module:

* ``misra_gries_candidates`` — one pass per input partition holding at
  most ``k`` counters (classic Misra-Gries); the only data that leaves
  an executor is ≤ k candidate rows per partition, never the token
  stream itself.  Distributed-superset guarantee (pigeonhole over
  partition sub-streams): any token with global frequency
  > N/(k+1) exceeds n_p/(k+1) on at least one partition, so it
  survives in that partition's sketch.
* ``heavy_hitters`` — candidates (a few thousand rows at most) are
  de-duplicated and broadcast back for ONE exact recount restricted to
  candidate tokens: explode + broadcast semi-join + hash aggregate with
  map-side partial combine.  Hot keys are by construction the common
  case here, and partial aggregation collapses each to one row per map
  task — no skewed shuffle.  Final output is EXACT (count ≥ threshold
  over true counts), so the oracle gate is a plain GROUP BY / HAVING,
  not a tolerance band: the sketch only prunes the candidate space.

Python appears only in the per-partition sketch (`mapInPandas`, Arrow
batches, dict counters) — the recount path is pure JVM.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import tokens

_CAND_SCHEMA = T.StructType([T.StructField("token", T.StringType(), False)])


def misra_gries_candidates(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-partition Misra-Gries sketch → candidate token set (distinct).

    ``k`` is the counter budget per partition.  Tokenization matches the
    engine-wide convention (lowercase, whitespace split, empties
    dropped) so the recount and the DuckDB oracle see the same tokens.
    """

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                for tok in text.strip().lower().split():
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < k:
                        counters[tok] = 1
                    else:
                        # decrement-all step; drop zeroed counters
                        dead = []
                        for key in counters:
                            counters[key] -= 1
                            if counters[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    return docs.select(text_col).mapInPandas(sketch, _CAND_SCHEMA).distinct()


def heavy_hitters(
    docs: DataFrame,
    phi: float = 0.01,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokens whose EXACT corpus frequency is ≥ ``phi`` of all tokens.

    Two jobs: (1) sketch pass producing candidates with counter budget
    k = ceil(2/phi) (> 1/phi, so the superset guarantee covers the
    threshold with slack), (2) exact recount of candidates only.
    Returns ``(token, cnt)`` with exact counts — the sketch can only
    prune tokens that provably cannot reach the threshold.
    """
    k = int(2.0 / phi) + 1
    cands = misra_gries_candidates(docs, k, text_col, id_col)

    # Recount pass: ONE corpus explode yields both the exact candidate
    # counts and the total token count — non-candidates collapse into a
    # single NULL group (their identity is irrelevant, only their mass
    # enters n_total).  The naive form ran a third full tokenize pass
    # just for the total (round-6 census).
    toks = docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
    per = (
        toks.join(F.broadcast(cands.withColumn("__hit", F.lit(1))), "token", "left")
        .groupBy(
            F.when(F.col("__hit") == 1, F.col("token")).alias("token")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .cache()
    )
    total = per.groupBy().agg(F.sum("cnt").alias("n_total"))
    return (
        per.filter(F.col("token").isNotNull())
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(phi) * F.col("n_total")))
        .select("token", "cnt")
    )


def _cms_col(tok: Column, row: int, width: int) -> Column:
    """Row-``row`` CMS column index of a token: first 8 md5 hex digits
    of ``row|token`` mod width — reproducible in ANSI SQL."""
    h = F.md5(F.concat(F.lit(f"{row}|"), tok))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def count_min_sketch_cells(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Count-min sketch of the token stream as a (row, col, cnt) table.

    CMS is a LINEAR sketch: each partition's cell counts sum to the
    stream's cell counts, so the build is one explode (depth rows per
    token occurrence) + a map-side-combinable groupBy over depth×width
    cells — the exchange carries at most depth×width rows per map task
    regardless of corpus size, and merging shards/days is plain cell
    addition.  Hashes are md5-derived (deterministic, engine-portable).
    """
    toks = docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_col(F.col("token"), j, width).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.row", "c.col")
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))


def cms_frequency_audit(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Every distinct token's CMS estimate checked against its true
    count — the q50-style verdict gate for a sketch whose estimate SQL
    cannot reproduce: output carries the exact count plus two booleans
    the oracle asserts are all-true.

    ``within_lower``: est >= true count (CMS never undercounts — holds
    unconditionally).  ``within_upper``: est <= count + ceil(e·N/width)
    (the standard error bound; deterministic for fixed data + hashes).
    The estimate joins each token's depth cells against the broadcast
    cell table and takes the min.

    r12 OPTIMIZATION (guide §2.3/§2.4): CMS is linear, so the cell
    table is the same whether built from the raw token stream or from
    the per-token exact counts — cell = Σ cnt of tokens hashing there.
    Building it from the vocabulary-sized ``true_counts`` (cached: it
    also feeds the probes and the N total) removes the second full
    tokenize+explode pass over the corpus; the depth-way cell explode
    now runs over |vocab| rows instead of the token stream (sf0.1
    in-session A/B: 0.96 s → 0.61 s solo, match-verified).
    """
    import math

    toks = docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
    # r13 (r12 verdict #1): eager localCheckpoint, not cache() — the
    # vocabulary-sized pin must not outlive the query in the session
    # CacheManager; blocks are ContextCleaner-freed on GC.
    true_counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = true_counts.agg(F.sum("cnt").alias("n_total"))
    cms = (
        true_counts.select(
            "cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("row"),
                            _cms_col(F.col("token"), j, width).alias("col"),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("c"),
        )
        .groupBy("c.row", "c.col")
        .agg(F.sum("cnt").alias("cnt"))
        .select("row", "col", "cnt")
    )

    probes = true_counts.select(
        "token",
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _cms_col(F.col("token"), j, width).alias("col"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select("token", "cnt", "p.row", "p.col")
    cells = cms.withColumnRenamed("cnt", "cell_cnt")
    est = (
        probes.join(F.broadcast(cells), ["row", "col"])
        .groupBy("token", "cnt")
        .agg(F.min("cell_cnt").alias("est"))
    )
    slack = F.ceil(F.lit(math.e / width) * F.col("n_total"))
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "token",
            "cnt",
            (F.col("est") >= F.col("cnt")).alias("within_lower"),
            (F.col("est") <= F.col("cnt") + slack).alias("within_upper"),
        )
    )
