"""Skew mitigation: salted joins and two-phase salted aggregation.

AQE's skew-join splitting handles sort-merge skew at runtime; these
helpers cover the cases AQE can't: broadcast-ineligible skewed equi-joins
(salt the big side, replicate the small side per salt) and hot-key
aggregations (pre-aggregate on (key, salt) so one reducer never owns a
whole hot key).

Results are exactly equal to the unsalted equivalents — tests assert
equality — so callers can switch them in purely on skew evidence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join where ``big``'s hot keys would overwhelm single shuffle
    partitions: salt the big side into ``n_salts`` sub-keys, explode the
    small side once per salt, join on (key, salt).

    ``salt_source`` — deterministic expression to derive the salt from
    (default: xxhash64 over all big-side columns, stable across runs).
    |small| grows n_salts×, so keep the small side genuinely small.
    """
    salt = F.pmod(
        salt_source if salt_source is not None else F.xxhash64(*[F.col(c) for c in big.columns]),
        F.lit(n_salts),
    ).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on=[on, "__salt"], how=how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys.

    ``aggs`` maps output column -> (function, input column) where
    function ∈ {count, sum, min, max} (the decomposable set: partials
    combine with sum/sum/min/max).  Phase 1 aggregates on
    (keys + salt) — spreading a hot key over ``n_salts`` reducers —
    phase 2 combines the partials per key.

    Spark already plans map-side partial aggregation for these
    functions; salting additionally splits the *reduce* side, which
    matters when one key's partials alone exceed a single task.
    """
    supported = {"count", "sum", "min", "max"}
    for out, (fn, _col) in aggs.items():
        if fn not in supported:
            raise ValueError(f"{out}: {fn} is not decomposable (supported: {supported})")
    salt = F.pmod(
        salt_source if salt_source is not None else F.xxhash64(*[F.col(c) for c in df.columns]),
        F.lit(n_salts),
    ).cast("int")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            getattr(F, fn)(F.lit(1) if fn == "count" else c).alias(out)
            for out, (fn, c) in aggs.items()
        ]
    )
    combine = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    return phase1.groupBy(*keys).agg(
        *[combine[fn](out).alias(out) for out, (fn, _c) in aggs.items()]
    )
