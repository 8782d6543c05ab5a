"""Relation semantics: hydration joins and relation filters.

Re-expresses the reference's Prisma relation surface:

* ``include: {relation: true}`` hydration — 1:1 via left outer join
  (src/runner/syncCrm.ts:65-68 includes ``crmSyncEvent``), m:n via
  bridge join + ``collect_list`` (``servicesOffered`` through the implicit
  ``_CompanyToFirmService`` bridge, schema.prisma:58,74).
* relation list filters ``some`` / ``none`` / ``every``
  (src/db/client/models/FirmService.ts:272-275) — semi join, anti join,
  and anti-join-against-violating-children respectively.
* 1:1 relation ``is null`` / ``isNot null`` (CrmSyncEventNullableScalar-
  RelationFilter, Company.ts:226) — anti/semi join on the FK.

Scale notes: relation filters are semi/anti joins — no row multiplication,
shuffle on the FK only.  Dimension sides that fit in memory take a
``broadcast()`` hint (the reference's dims are tiny: FirmService is a
128-row vocabulary), which removes the shuffle entirely.  m:n hydration's
``collect_list`` keys the shuffle on the fact PK — bounded state per group
(≤ vocabulary size), safe at any fact cardinality.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..predicates import compile_order_by, compile_where


def _maybe_broadcast(df: DataFrame, hint: bool) -> DataFrame:
    return F.broadcast(df) if hint else df


def hydrate_one_to_one(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    *,
    struct_col: str | None = None,
    broadcast_child: bool = False,
) -> DataFrame:
    """``include: {child: true}`` for a 1:1 relation.

    Left outer join; when ``struct_col`` is given the child's columns are
    packed into one nullable struct column (null struct ≡ relation absent,
    which is what Prisma's relation-is-null filter tests).
    """
    c = _maybe_broadcast(child, broadcast_child)
    if struct_col is not None:
        c = c.select(
            F.col(child_fk).alias("__fk"),
            F.struct(*[F.col(x) for x in child.columns]).alias(struct_col),
        )
        return parent.join(c, parent[parent_key] == c["__fk"], "left").drop("__fk")
    return parent.join(c, parent[parent_key] == c[child_fk], "left")


def hydrate_many_to_many(
    fact: DataFrame,
    bridge: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    bridge_fact_fk: str,
    bridge_dim_fk: str,
    dim_key: str,
    dim_value: str,
    array_col: str = "values",
    broadcast_dim: bool = True,
    where: dict[str, Any] | None = None,
    order_by: Any = None,
    take: int | None = None,
) -> DataFrame:
    """``include: {servicesOffered: {...}}`` — m:n hydration to an array,
    honoring Prisma's nested include arguments.

    fact ⟗ (bridge ⋈ dim) grouped back to one row per fact with an array
    of dim values.  Facts with zero (surviving) bridge rows keep an empty
    array, preserving the reference's ``servicesOffered.length === 0``
    skip branch (src/runner/syncCrm.ts:107-125).

    Nested args (CompanyInclude per-relation where/orderBy/take,
    reference src/db/client/models/Company.ts:764,1243):

    * ``where`` — Prisma filter dict over the joined bridge+dim columns,
      applied BEFORE grouping (so excluded children never shuffle).
    * ``order_by`` / ``take`` — children are ranked per fact by the
      compiled order (tie-broken by ``dim_key`` for determinism) with one
      window over the same ``bridge_fact_fk`` partitioning the final
      groupBy uses — the rank and the aggregation share one shuffle.
      ``take`` keeps the first N children per fact; the output array
      preserves the requested child order (rank-sorted structs), where
      the unordered variant value-sorts for engine determinism.
    """
    joined = bridge.join(
        _maybe_broadcast(dim, broadcast_dim),
        bridge[bridge_dim_fk] == dim[dim_key],
    )
    if where is not None:
        joined = joined.filter(compile_where(where))
    if order_by is not None or take is not None:
        order_cols = compile_order_by(order_by) + [F.col(dim_key)]
        w = Window.partitionBy(F.col(bridge_fact_fk)).orderBy(*order_cols)
        ranked = joined.withColumn("__rk", F.row_number().over(w))
        if take is not None:
            ranked = ranked.filter(F.col("__rk") <= take)
        pairs = ranked.select(
            F.col(bridge_fact_fk).alias("__fk"),
            F.struct(F.col("__rk").alias("rk"), F.col(dim_value).alias("v")).alias("__sv"),
        )
        agg = pairs.groupBy("__fk").agg(
            F.transform(F.array_sort(F.collect_list("__sv")), lambda s: s["v"]).alias(array_col)
        )
    else:
        pairs = joined.select(
            F.col(bridge_fact_fk).alias("__fk"), F.col(dim_value).alias("__v")
        )
        agg = pairs.groupBy("__fk").agg(F.array_sort(F.collect_list("__v")).alias(array_col))
    elem_type = dict(agg.dtypes)[array_col]
    out = fact.join(agg, fact[fact_key] == agg["__fk"], "left").drop("__fk")
    return out.withColumn(
        array_col,
        F.coalesce(F.col(array_col), F.array().cast(elem_type)),
    )


# -- relation filters -------------------------------------------------------


def relation_some(
    parent: DataFrame, child: DataFrame, parent_key: str, child_fk: str,
    predicate: Column | None = None,
) -> DataFrame:
    """``relation: {some: {...}}`` ≡ EXISTS ≡ left semi join."""
    c = child.filter(predicate) if predicate is not None else child
    return parent.join(
        c.select(F.col(child_fk).alias("__fk")), parent[parent_key] == F.col("__fk"), "left_semi"
    )


def relation_none(
    parent: DataFrame, child: DataFrame, parent_key: str, child_fk: str,
    predicate: Column | None = None,
) -> DataFrame:
    """``relation: {none: {...}}`` ≡ NOT EXISTS ≡ left anti join.

    Also implements 1:1 ``relation is null`` (the CRM-sync poll query,
    src/runner/syncCrm.ts:60-69: companies with no crmSyncEvent).
    """
    c = child.filter(predicate) if predicate is not None else child
    return parent.join(
        c.select(F.col(child_fk).alias("__fk")), parent[parent_key] == F.col("__fk"), "left_anti"
    )


def relation_every(
    parent: DataFrame, child: DataFrame, parent_key: str, child_fk: str,
    predicate: Column,
) -> DataFrame:
    """``relation: {every: {...}}`` ≡ no child violates the predicate.

    Prisma semantics: parents with zero children PASS.  Compiled as an
    anti join against the violating children — one shuffle, no count
    comparison needed.
    """
    violating = child.filter(~predicate)
    return relation_none(parent, violating, parent_key, child_fk)


def order_by_relation_count(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    direction: str = "asc",
    tie_break: str | None = None,
    count_col: str = "_relation_count",
    child_predicate: Column | None = None,
) -> DataFrame:
    """``orderBy: {relation: {_count: dir}}`` — Prisma's order-by-relation-
    aggregate (FirmServiceOrderByRelationAggregateInput, reference
    src/db/client/models/Company.ts:240).

    Compiled as: child groupBy-count on the FK (map-side partial combine —
    the shuffle carries one (fk, count) pair per parent with children),
    left join back to the parent (childless parents count 0), sort by the
    count.  ``tie_break`` (typically the parent PK) makes take/limit
    boundaries deterministic — Prisma inherits storage order; a
    distributed engine must pick one.  The count column stays in the
    output under ``count_col`` so callers (and oracles) can see it.
    """
    c = child.filter(child_predicate) if child_predicate is not None else child
    counts = c.groupBy(F.col(child_fk).alias("__fk")).agg(
        F.count(F.lit(1)).alias(count_col)
    )
    out = (
        parent.join(counts, parent[parent_key] == F.col("__fk"), "left")
        .drop("__fk")
        .withColumn(count_col, F.coalesce(F.col(count_col), F.lit(0)))
    )
    sort = [F.col(count_col).desc() if direction == "desc" else F.col(count_col).asc()]
    if tie_break is not None:
        sort.append(F.col(tie_break))
    return out.orderBy(*sort)
