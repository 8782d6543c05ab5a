"""Model query API: the reference's per-model delegate surface on DataFrames.

Mirrors the 16-method Prisma delegate (reference: generated client, e.g.
src/db/client/models/Company.ts:813-1111 and the Effect wrapper
src/db/client/effect.ts:430+) minus the mutation methods, which live in
operators/mutations.py.  Read methods here:

    find_unique / find_first / find_many   (Company.ts:813,842,876)
    count                                  (Company.ts:1057)
    aggregate                              (Company.ts:1091)
    group_by                               (Company.ts:1111)

Everything stays declarative DataFrame API so Catalyst prunes/pushes; the
only intentional divergence from the reference is documented on
``find_first``: Prisma's un-ordered findFirst is storage-order
nondeterministic (src/runner/locator.ts:61-67), ours tie-breaks on the
provided order or not at all (caller's choice), because a distributed scan
has no storage order.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType

from .predicates import compile_order_by, compile_where

class RecordNotFoundError(LookupError):
    """Raised by the *_or_throw finders when no record matches — the
    engine's analogue of Prisma's NotFoundError (effect.ts:439,455)."""


def _snap_lossless(col: Column) -> tuple[Column, Column]:
    """(decimal-snapped column, per-group losslessness flag).

    The flag is an aggregate: 1 iff EVERY row in the group survives the
    DECIMAL(30,6) round-trip bit-exactly (NULLs pass).  ``try_cast``
    sends NaN/±Inf/|x|>=1e24 to NULL (never raises under ANSI), and the
    round-trip comparison rejects sub-micro magnitudes and >6dp
    fractions, so the flag is 0 exactly when the snap would change the
    answer.  Order-independent by construction (an all-rows MIN).

    The snapped column is NULL for rows that fail the round-trip (not
    just for NULL inputs), so downstream decimal aggregates accumulate
    ONLY lossless values: a fallback group's huge/non-finite rows can
    never overflow an aggregate whose result the CASE discards anyway
    (r11 ADVICE #2)."""
    dec = col.try_cast("decimal(30,6)")
    ok = col.isNull() | (dec.cast("double") == col)
    return F.when(ok, dec), F.min(F.when(ok, 1).otherwise(0)) == 1


def _sum_exact(col: Column) -> Column:
    """Partition-order-independent SUM for float/double columns that
    keeps plain ``sum(double)`` semantics for true continuous floats.

    ``sum(double)`` accumulates in float and its last-ulp digits depend
    on addend order — the r9 sf3 differential caught q07's 30x-addend
    money sum drifting from the single-threaded oracle's.  For
    fixed-point data (money in 2dp, quantities) the DECIMAL(30,6) snap
    is EXACT at any scale and bit-identical under any partitioning, so
    groups whose every value round-trips through the decimal losslessly
    aggregate in decimal.  Any other group — NaN/±Inf inputs, |x| past
    the 1e24 decimal ceiling, sub-micro magnitudes, >6dp fractions —
    falls back to the reference's plain ``SUM(double)`` in the same
    aggregation pass (r10 ADVICE: the unconditional snap quantized
    generic floats at 1e-6 and raised under ANSI on non-finite input).
    Both branches are map-side-combinable aggregates; the CASE picks
    between them after the shuffle.

    Residual ceiling (r11 ADVICE #2): the decimal accumulator is
    DECIMAL(38,6), so a group of ≥~1e8 lossless values near the 1e24
    row ceiling can overflow it even though each row round-trips.
    ``try_sum`` turns that overflow into NULL instead of an ANSI raise
    and the COALESCE falls back to the reference's ``SUM(double)`` —
    exactness degrades to reference semantics at ~1e32 per group, it
    never kills the query."""
    dec, lossless = _snap_lossless(col)
    return F.coalesce(
        F.when(lossless, F.try_sum(dec).cast("double")), F.sum(col)
    )


def _avg_exact(col: Column) -> Column:
    """AVG via the exact decimal sum over the non-null count — same
    determinism + fallback + overflow-degradation argument as
    ``_sum_exact``; the lossless branch's single final division is
    double, mirroring ``CAST(sum AS DOUBLE) / count(col)``."""
    dec, lossless = _snap_lossless(col)
    return F.coalesce(
        F.when(lossless, F.try_sum(dec).cast("double") / F.count(col)),
        F.avg(col),
    )


def _agg_expr(df: DataFrame, agg_key: str, field: str) -> Column:
    """Resolve one Prisma aggregate to a Spark expression; float/double
    ``_sum``/``_avg`` route through the exact-decimal forms (see
    ``_sum_exact``) so distributed results hash-match a
    single-threaded oracle at every scale."""
    if agg_key in ("_sum", "_avg") and isinstance(
        df.schema[field].dataType, (FloatType, DoubleType)
    ):
        fn = _sum_exact if agg_key == "_sum" else _avg_exact
        return fn(F.col(field)).alias(f"{agg_key[1:]}_{field}")
    return _AGG_FNS[agg_key](F.col(field)).alias(f"{agg_key[1:]}_{field}")


_AGG_FNS = {
    "_count": F.count,
    "_min": F.min,
    "_max": F.max,
    "_sum": F.sum,
    "_avg": F.avg,
}


def _paginate(
    df: DataFrame,
    order_by=None,
    take: int | None = None,
    skip: int | None = None,
    cursor: dict[str, Any] | None = None,
) -> DataFrame:
    """orderBy → cursor (keyset) → offset(skip) → limit(take).

    Cursor pagination compiles to a keyset predicate (``key >= value`` on
    the ordered key), the scale-safe pagination strategy: unlike
    offset-only paging it does not rescan/discard at 100 TB.  Prisma
    includes the cursor row itself; skip=1 excludes it (same contract).
    """
    cols = compile_order_by(order_by)
    if cursor:
        if not order_by:
            raise ValueError("cursor pagination requires order_by")
        ((field, value),) = cursor.items()
        direction = order_by if isinstance(order_by, dict) else order_by[0]
        spec = direction[field]
        desc = (spec if isinstance(spec, str) else spec.get("sort", "asc")) == "desc"
        df = df.filter(F.col(field) <= F.lit(value) if desc else F.col(field) >= F.lit(value))
    if cols:
        df = df.orderBy(*cols)
    if skip:
        df = df.offset(skip)
    if take is not None:
        df = df.limit(take)
    return df


class Model:
    """Query delegate for one table, Prisma-shaped."""

    def __init__(self, df: DataFrame, name: str = "model"):
        self.df = df
        self.name = name

    # -- finds ------------------------------------------------------------

    def find_many(
        self,
        where: dict | None = None,
        order_by=None,
        take: int | None = None,
        skip: int | None = None,
        cursor: dict[str, Any] | None = None,
        distinct: list[str] | None = None,
        select: list[str] | None = None,
    ) -> DataFrame:
        out = self.df.filter(compile_where(where))
        if distinct:
            # Prisma distinct-on-fields: first row per distinct combination.
            # dropDuplicates matches when the caller doesn't rely on which
            # row survives; with order_by we pick the ordered-first row via
            # a window (deterministic, unlike dropDuplicates).
            if order_by:
                from pyspark.sql import Window

                w = Window.partitionBy(*distinct).orderBy(*compile_order_by(order_by))
                out = (
                    out.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            else:
                out = out.dropDuplicates(distinct)
        out = _paginate(out, order_by, take, skip, cursor)
        if select:
            out = out.select(*select)
        return out

    def find_first(self, where: dict | None = None, order_by=None, select: list[str] | None = None) -> DataFrame:
        return self.find_many(where, order_by, take=1, select=select)

    def find_unique(self, where: dict, select: list[str] | None = None) -> DataFrame:
        return self.find_first(where, select=select)

    def find_first_or_throw(
        self, where: dict | None = None, order_by=None, select: list[str] | None = None
    ) -> DataFrame:
        """findFirstOrThrow (reference src/db/client/effect.ts:455):
        raises ``RecordNotFoundError`` when no row matches.

        The existence probe executes the (take-1-limited) plan eagerly —
        the throw-on-miss contract requires an action; the returned
        DataFrame is the same one-row plan for composition.
        """
        out = self.find_first(where, order_by, select)
        if not out.head(1):
            raise RecordNotFoundError(
                f"{self.name}: no record found for where={where!r}"
            )
        return out

    def find_unique_or_throw(self, where: dict, select: list[str] | None = None) -> DataFrame:
        """findUniqueOrThrow (reference src/db/client/effect.ts:439)."""
        return self.find_first_or_throw(where, select=select)

    # -- aggregates --------------------------------------------------------

    def count(self, where: dict | None = None, select: list[str] | None = None) -> DataFrame:
        """count with filter; ``select`` adds per-field non-null counts
        (Prisma ``_count: {_all, field}`` — count(col) skips nulls)."""
        filtered = self.df.filter(compile_where(where))
        aggs = [F.count(F.lit(1)).alias("_all")]
        for f in select or []:
            aggs.append(F.count(F.col(f)).alias(f))
        return filtered.agg(*aggs)

    def aggregate(
        self,
        where: dict | None = None,
        order_by=None,
        take: int | None = None,
        skip: int | None = None,
        **aggs: dict,
    ) -> DataFrame:
        """Global aggregates: ``aggregate(_min={"x": True}, _sum={"y": True})``.

        Output columns are named ``<agg>_<field>`` (``_count`` of ``_all``
        → ``count_all``).  Prisma applies where/orderBy/take/skip before
        aggregating (Company.ts:108-155); so do we.
        """
        df = _paginate(self.df.filter(compile_where(where)), order_by, take, skip)
        exprs: list[Column] = []
        for agg_key, fields in aggs.items():
            for field in fields:
                if agg_key == "_count" and field == "_all":
                    exprs.append(F.count(F.lit(1)).alias("count_all"))
                else:
                    exprs.append(_agg_expr(df, agg_key, field))
        if not exprs:
            raise ValueError("aggregate() needs at least one _count/_min/_max/_sum/_avg")
        return df.agg(*exprs)

    def group_by(
        self,
        by: list[str],
        where: dict | None = None,
        having: dict | None = None,
        order_by=None,
        take: int | None = None,
        skip: int | None = None,
        **aggs: dict,
    ) -> DataFrame:
        """groupBy + aggregates + HAVING + order-by-aggregate + limit.

        ``having`` uses the same filter vocabulary, over the aggregate
        output columns (Prisma ScalarWhereWithAggregatesInput,
        Company.ts:278-292): ``having={"count_all": {"gt": 3}}``.
        Aggregation is partial-then-final (map-side combine) by Spark
        default, so the shuffle carries only group states — scale-safe as
        long as group cardinality is bounded.
        """
        df = self.df.filter(compile_where(where))
        exprs: list[Column] = []
        for agg_key, fields in aggs.items():
            for field in fields:
                if agg_key == "_count" and field == "_all":
                    exprs.append(F.count(F.lit(1)).alias("count_all"))
                else:
                    exprs.append(_agg_expr(df, agg_key, field))
        out = df.groupBy(*by).agg(*exprs) if exprs else df.groupBy(*by).agg(F.count(F.lit(1)).alias("count_all"))
        if having:
            out = out.filter(compile_where(having))
        return _paginate(out, order_by, take, skip)
