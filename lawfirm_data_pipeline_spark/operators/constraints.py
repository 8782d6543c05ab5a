"""Declarative data-constraint audits: uniqueness, referential
integrity, and value-domain checks as DataFrame plans.

Reference parity: the reference delegates these invariants to Postgres
DDL — unique indexes on ``PlaceEntry.url`` / ``Company.name`` /
``FirmService.name`` / ``CrmSyncEvent.companyId`` and FK constraints
with RESTRICT/CASCADE (`src/db/migrations/20260102130331_init/
migration.sql:79-103`), plus a 127-value enum vocabulary for service
tags (`scrapeWebsite.ts:22-152`).  A lake engine has no enforcing
store, so the SAME invariants become audit queries a pipeline runs
after every write (SURVEY.md §4 "uniqueness must be maintained by
transforms, not declared").

Scale posture: a uniqueness check is one map-side-combinable groupBy on
the key (violating keys only — the exchange carries key + count, no
payload); an FK-orphan check reduces the parent side to DISTINCT keys
before a left_anti join (broadcast when the parent key set is small,
else a co-partitioned shuffle join); a domain check is a scan-side
filter against a broadcast literal set.  The summary collapses each
check to ONE row before the union, so the audit result is O(#checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uniqueness_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key tuples appearing more than once: ``(*keys, n_rows)``."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_orphans(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose FK value has no parent (NULL FKs are not
    orphans, matching SQL FK semantics)."""
    parents = parent.select(F.col(parent_key).alias("__pk")).distinct()
    return child.filter(F.col(child_key).isNotNull()).join(
        parents, child[child_key] == F.col("__pk"), "left_anti"
    )


def domain_violations(df: DataFrame, col: str, allowed: list[str]) -> DataFrame:
    """Rows whose ``col`` is non-null but outside the allowed set."""
    return df.filter(F.col(col).isNotNull() & ~F.col(col).isin(list(allowed)))


def constraint_audit(checks: dict[str, DataFrame]) -> DataFrame:
    """Collapse named violation frames to ``(check, n_violations)``.

    Each frame aggregates to one row BEFORE the union — the audit
    output is #checks rows regardless of table sizes.
    """
    parts = [
        df.agg(F.count(F.lit(1)).alias("n_violations")).select(
            F.lit(name).alias("check"), "n_violations"
        )
        for name, df in checks.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
