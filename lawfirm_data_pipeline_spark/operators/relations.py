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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
) -> DataFrame:
    """``include: {servicesOffered: true}`` — m:n hydration to an array.

    fact ⟗ (bridge ⋈ dim) grouped back to one row per fact with a sorted
    array of dim values.  Sorting makes the array deterministic (Prisma
    returns storage order; a distributed engine has none to offer).
    Facts with zero bridge rows keep an empty array, preserving the
    reference's ``servicesOffered.length === 0`` skip branch
    (src/runner/syncCrm.ts:107-125).
    """
    pairs = bridge.join(
        _maybe_broadcast(dim, broadcast_dim),
        bridge[bridge_dim_fk] == dim[dim_key],
    ).select(F.col(bridge_fact_fk).alias("__fk"), F.col(dim_value).alias("__v"))
    agg = pairs.groupBy("__fk").agg(F.array_sort(F.collect_list("__v")).alias(array_col))
    out = fact.join(agg, fact[fact_key] == agg["__fk"], "left").drop("__fk")
    return out.withColumn(
        array_col,
        F.coalesce(F.col(array_col), F.array().cast(f"array<string>")),
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
