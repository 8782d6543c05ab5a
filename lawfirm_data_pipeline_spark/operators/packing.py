"""Sequence packing: concat-and-chunk documents into fixed-size
training sequences.

Pretraining consumes fixed-length token sequences (ctx_len), not
documents.  The standard packing recipe concatenates documents in a
deterministic order and slices the token stream every ``ctx_len``
tokens — zero padding waste, and each document's placement is a pure
function of the corpus (rerun-stable, resumable).

The core primitive is a GLOBAL running token offset.  The naive Spark
formulation — ``sum(n_tok) OVER (ORDER BY key)`` with no PARTITION BY —
moves the entire corpus through ONE task (Spark implements an
unpartitioned window as a single-partition sort), which is the
canonical 100 TB scale-killer.  ``exclusive_prefix_sum`` instead runs
the textbook two-phase distributed scan:

1. range-bucket rows by a prefix of the (uniform, md5-derived) order
   key — the hex prefix IS a range partition of the md5 lexicographic
   order, so no sampling pass is needed;
2. per-bucket local cumsum (window partitioned BY bucket — parallel);
3. per-bucket totals (one tiny agg row per bucket) → exclusive bucket
   offsets via a window over the bucket table (256 rows — trivially
   single-partition); broadcast-join the offsets back.

Cost at any scale: one shuffle into ~uniform buckets + one broadcast of
a 256-row table.  For NON-uniform order keys (revenue ranks, quality
scores) use ``operators/ranking.py`` — same two-phase scan with a
sampled ``repartitionByRange`` instead of the free md5-prefix buckets
(one extra shuffle, any key distribution).  Reference parity: the
reference has no packing stage (it trains nothing); this is charter
scope from the training-data pipeline mandate (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

# Hex chars in the bucket prefix: 2 → 256 buckets.  At 100 TB each
# bucket holds ~0.4 TB of (key, n_tok) pairs — the windowed columns are
# a few dozen bytes/row, so a bucket's window state stays executor-sized;
# bump to 3 (4096 buckets) beyond ~1 PB.
_BUCKET_HEX = 2


def order_key(key: Column | str, salt: str = "") -> Column:
    """Deterministic global shuffle order: md5 of the key.  Decorrelates
    adjacency from ingest order (source/time locality) so every packed
    sequence mixes sources — and gives a uniform key whose hex prefix
    range-partitions the sort order for free."""
    c = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(salt), c.cast("string")))


def exclusive_prefix_sum(
    df: DataFrame, value_col: str, key_col: str, out_col: str = "tok_offset"
) -> DataFrame:
    """Exclusive running sum of ``value_col`` in ``key_col`` order
    (md5-style uniform keys), without a single-partition global window.

    Adds ``out_col`` = sum of values over all rows strictly before this
    row in ``key_col`` lexicographic order (ties broken arbitrarily but
    deterministically only if ``key_col`` is unique — pass a unique key).
    """
    bucket = F.substring(F.col(key_col), 1, _BUCKET_HEX).alias("_pb")
    b = df.withColumn("_pb", bucket)
    # phase 2: local inclusive cumsum inside each range bucket
    w_local = (
        Window.partitionBy("_pb")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("_cum_incl", F.sum(value_col).over(w_local))
    # phase 3: tiny bucket-totals table → exclusive bucket offsets
    totals = b.groupBy("_pb").agg(F.sum(value_col).alias("_bt"))
    w_bucket = (
        Window.orderBy("_pb").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pb", F.coalesce(F.sum("_bt").over(w_bucket), F.lit(0)).alias("_eps_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pb")
        .withColumn(out_col, (F.col("_eps_off") + F.col("_cum_incl") - F.col(value_col)).cast("long"))
        .drop("_pb", "_cum_incl", "_eps_off")
    )


def pack_sequences(
    docs: DataFrame,
    ctx_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Returns one row per non-empty document:
    ``(id, n_tok, tok_offset, seq_first, seq_last, n_seqs)`` where
    ``tok_offset`` is the document's start position in the concatenated
    stream and ``seq_first..seq_last`` the ctx_len-sized training
    sequences it lands in (a document crossing a boundary spans
    several).  ``floor(total_tokens / ctx_len) + 1`` sequences cover
    the corpus with zero padding.

    The writer stage turns this map into physical sequences by
    repartitioning on ``seq_first`` range — documents for neighbouring
    sequences are adjacent in the md5 order, so a range repartition is
    shuffle-minimal.
    """
    t = docs.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"),
        order_key(id_col, salt).alias("_ok"),
    ).filter(F.col("n_tok") > 0)
    summed = exclusive_prefix_sum(t, "n_tok", "_ok", out_col="tok_offset")
    return summed.select(
        id_col,
        "n_tok",
        "tok_offset",
        F.floor(F.col("tok_offset") / ctx_len).alias("seq_first"),
        F.floor((F.col("tok_offset") + F.col("n_tok") - 1) / ctx_len).alias("seq_last"),
        (
            F.floor((F.col("tok_offset") + F.col("n_tok") - 1) / ctx_len)
            - F.floor(F.col("tok_offset") / ctx_len)
            + 1
        ).alias("n_seqs"),
    )


def packing_summary(packed: DataFrame, ctx_len: int) -> DataFrame:
    """Corpus-level packing report: total tokens / sequences, and how
    many documents straddle a sequence boundary (a proxy for attention
    cross-contamination when training without sequence masking)."""
    return packed.agg(
        F.sum("n_tok").alias("total_tokens"),
        F.ceil(F.sum("n_tok") / ctx_len).alias("n_sequences"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_seqs") > 1, 1).otherwise(0)).alias("n_boundary_docs"),
    )


def shard_assignments(
    df: DataFrame,
    n_shards: int,
    size_col: Column | str,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Assign rows to ``n_shards`` output shards of ~equal total bytes.

    Naive ``repartition(n)`` balances ROW counts; with skewed document
    lengths the byte sizes of the resulting files diverge badly (one
    fat shard stalls every downstream reader).  This balances BYTES:
    rows ordered by their md5 key get a running byte offset (the same
    two-phase scan as packing) and shard ``floor(offset / ceil(total /
    n))`` — contiguous byte ranges, so every shard is within one row's
    size of the ideal.  The writer repartitions on ``shard`` and writes;
    assignment is a pure function of the corpus (rerun-stable).
    """
    sz = F.col(size_col) if isinstance(size_col, str) else size_col
    t = df.withColumn("_sz", sz.cast("long")).withColumn(
        "_ok", order_key(key_col, salt)
    )
    summed = exclusive_prefix_sum(t, "_sz", "_ok", out_col="_run_off")
    # total from the PRE-prefix-sum table: summing over `summed` made
    # the broadcast side re-run the whole two-phase prefix-sum
    # machinery (two windows + a join) just to add up _sz — the exact
    # integer sum is identical on either side (guide §2.4)
    total = t.agg(F.sum("_sz").alias("_tot"))
    return (
        summed.crossJoin(F.broadcast(total))
        .withColumn(
            "shard",
            F.least(
                F.floor(F.col("_run_off") / F.ceil(F.col("_tot") / n_shards)),
                F.lit(n_shards - 1),
            ).cast("int"),
        )
        .drop("_sz", "_ok", "_run_off", "_tot")
    )
