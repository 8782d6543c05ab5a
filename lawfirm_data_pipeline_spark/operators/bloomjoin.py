"""Bloom-filter-pruned semi-join, built natively in the DataFrame plan.

The classic 100 TB join problem: the fact side must shuffle in full to
discover that only a few percent of its rows match the (already
filtered) dimension.  Engines solve it with a runtime Bloom filter
pushed below the fact shuffle; Spark's own injected version
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) only fires for
shuffle-join shapes the planner picks, and ``bloom_filter_agg`` isn't in
the public function registry (PySpark 4.1 probe: UNRESOLVED_ROUTINE).
So this operator builds the same structure from public primitives:

* **build**: each dim key contributes ``n_hashes`` bit positions
  (xxhash64 with distinct seeds, mod ``n_bits``); a groupBy on the
  64-bit word index with ``bit_or`` folds them into <= n_bits/64 rows.
  The whole filter is a few KB — the driver collects it like IVF
  collects k centroids and re-emits it as a literal array, so the
  probe is a pure projection (no join, no shuffle) over the fact.
* **probe**: a row survives iff every one of its ``n_hashes`` bits is
  set — ``element_at(words, pos >> 6) & (1 << (pos & 63)) != 0`` for
  each seed, folded with AND.  False positives pass (by design),
  false negatives are impossible.
* **verify**: survivors flow into the ordinary leftsemi hash join, so
  the final result is EXACT — the Bloom stage only sheds shuffle
  volume.  At fact:dim selectivity s and fp rate p, the fact shuffle
  shrinks to ~(s + p) of itself; with the default 8 bits/key and 3
  hashes, p ~= 3%.

Result-identity with the plain semi-join is the oracle gate (q183) —
the same discipline as the salted-join gate (q157): the optimization
must be invisible in values and visible only in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom_words(keys: DataFrame, key_col: str, n_bits: int, n_hashes: int) -> list[int]:
    """Aggregate the dim keys into a dense little-endian word array.

    One explode (n_hashes rows per key), one ``bit_or`` groupBy whose
    result is at most n_bits/64 rows, one driver collect of those rows
    — sketch-sized, independent of dim cardinality.
    """
    n_words = (n_bits + 63) // 64
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(n_bits))
                for seed in range(n_hashes)
            ]
        )
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            # call_function: the typed shiftleft wrapper only takes a
            # Python-int shift, but the SQL function accepts a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def bloom_might_contain(
    key: Column, words: list[int], n_bits: int, n_hashes: int
) -> Column:
    """Membership predicate against a literal word array — projection-
    only: per probe hash one element_at + mask test.

    The word-ARRAY literal is the right representation: measured at
    sf0.1, this probe runs the 600k-row fact in ~0.7 s warm, while the
    tempting bit-STRING literal + substr probe takes 127 s —
    ``substr`` on a 64 KB UTF-8 literal walks to the byte offset per
    call, turning each probe into an O(n_bits) scan."""
    arr = F.array(*[F.lit(x).cast("long") for x in words])
    cond = F.lit(True)
    for seed in range(n_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(n_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
) -> DataFrame:
    """Exact ``fact SEMI JOIN dim`` with a Bloom pre-prune on the fact.

    Size ``n_bits`` at ~8-10 bits per distinct dim key for a ~2-3% fp
    rate; the filter costs n_bits/8 bytes broadcast once per stage.
    """
    words = build_bloom_words(dim.select(dim_key), dim_key, n_bits, n_hashes)
    pruned = fact.filter(bloom_might_contain(F.col(fact_key), words, n_bits, n_hashes))
    return pruned.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        fact_key,
        "leftsemi",
    )
