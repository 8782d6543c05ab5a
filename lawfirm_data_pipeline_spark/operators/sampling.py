"""Deterministic sampling for training pipelines.

``sample()``/``sampleBy()`` draw from an RNG seeded per partition —
resplitting changes membership, which poisons train/val hygiene.  These
operators derive membership from a content hash instead: a row's split
is a pure function of its key, stable across runs, partitionings,
engines, and table versions.  Both are scan-side projections — zero
shuffle at any scale — and oracle-reproducible (md5 on both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, n_buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets): first 8 md5 hex digits mod n.

    32 bits of hash keeps the modulo bias < 1e-7 for any practical
    bucket count while staying exactly reproducible in ANSI SQL
    (DuckDB: ``from_hex``/``conv`` equivalents).
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets


def hash_split(
    df: DataFrame,
    key: str,
    splits: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Assign each row to a named split by hash-bucket ranges.

    ``splits`` maps name -> fraction (must sum to ~1); e.g.
    ``{"train": 0.9, "val": 0.05, "test": 0.05}``.  Adds a ``split``
    column; membership is stable under any re-run or repartition.
    """
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    bucket = hash_bucket(key, 10_000, salt)
    expr = None
    lo = 0.0
    for name, frac in splits.items():
        hi = lo + frac
        cond = bucket < int(round(hi * 10_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn("split", expr.otherwise(list(splits)[-1]))


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    stratum: str,
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy`` without the RNG):
    keep a row iff its hash bucket falls under the stratum's fraction.
    Strata absent from ``fractions`` are dropped (sampleBy semantics).
    """
    bucket = hash_bucket(key, 10_000, salt)
    keep = None
    for value, frac in fractions.items():
        cond = (F.col(stratum) == value) & (bucket < int(round(frac * 10_000)))
        keep = cond if keep is None else keep | cond
    return df.filter(keep if keep is not None else F.lit(False))
