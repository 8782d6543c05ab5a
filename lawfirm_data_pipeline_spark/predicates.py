"""The reference's filter vocabulary as composable Spark Columns.

Re-expresses the Prisma `where` input language (generated types in the
reference at src/db/client/commonInputTypes.ts:18-155 and per-model
`*WhereInput`, e.g. src/db/client/models/Company.ts:211-227) as a compiler
from plain dicts to a single ``pyspark.sql.Column`` predicate.

Semantics preserved from the reference:

* ``equals: None`` compiles to ``IS NULL`` — Prisma's null-aware equals,
  not SQL ``= NULL`` (commonInputTypes.ts:33,48).
* ``not`` is null-aware the same way: ``{"not": None}`` ≡ ``IS NOT NULL``
  (used at src/runner/syncCrm.ts:63 as ``emailAddress: {not: null}``);
  ``{"not": <scalar>}`` must also be true for NULL rows? — no: Prisma
  translates ``not: v`` to ``NOT (x = v)`` with SQL three-valued logic, so
  NULL rows drop out; we reproduce that with plain ``~(col == lit)``.
* ``mode: "insensitive"`` lower-cases both sides (QueryMode,
  commonInputTypes.ts:28).
* Filters on a plain scalar value mean ``equals``.
* ``AND`` / ``OR`` / ``NOT`` compose recursively (Company.ts:212-214).
* String field references (compare column to column) via ``{"ref": name}``
  standing in for Prisma's FieldRefInput.

Everything compiles to built-in Column ops, so Catalyst can push the
resulting predicates into the parquet scan (no Python in the row path).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

BOOLEAN_OPS = ("AND", "OR", "NOT")
_COMPARATORS = {
    "lt": Column.__lt__,
    "lte": Column.__le__,
    "gt": Column.__gt__,
    "gte": Column.__ge__,
}


def _as_value(v: Any, insensitive: bool) -> Column:
    """Literal or field reference (Prisma FieldRefInput)."""
    if isinstance(v, dict) and set(v) == {"ref"}:
        c = F.col(v["ref"])
    else:
        c = F.lit(v)
    return F.lower(c) if insensitive else c


def _field_predicate(col: Column, spec: Any) -> Column:
    """Compile one field's filter spec (scalar shorthand or operator dict)."""
    if spec is None:
        return col.isNull()
    if not isinstance(spec, dict) or set(spec) == {"ref"}:
        return col == _as_value(spec, False)

    insensitive = spec.get("mode") == "insensitive"
    base = F.lower(col) if insensitive else col
    preds: list[Column] = []
    for op, v in spec.items():
        if op == "mode":
            continue
        if op == "equals":
            preds.append(base.isNull() if v is None else base == _as_value(v, insensitive))
        elif op == "not":
            # Null-aware for `not: null`; otherwise plain negation of the
            # (possibly nested) spec, three-valued like the reference's SQL.
            preds.append(col.isNotNull() if v is None else ~_field_predicate(col, v))
        elif op == "in":
            preds.append(base.isin([_v.lower() if insensitive and isinstance(_v, str) else _v for _v in v]))
        elif op == "notIn":
            preds.append(~base.isin([_v.lower() if insensitive and isinstance(_v, str) else _v for _v in v]))
        elif op in _COMPARATORS:
            preds.append(_COMPARATORS[op](base, _as_value(v, insensitive)))
        elif op == "contains":
            preds.append(base.contains(_as_value(v, insensitive)))
        elif op == "startsWith":
            preds.append(base.startswith(_as_value(v, insensitive)))
        elif op == "endsWith":
            preds.append(base.endswith(_as_value(v, insensitive)))
        else:
            raise ValueError(f"unsupported filter operator: {op!r}")
    if not preds:
        raise ValueError(f"empty filter spec for column: {spec!r}")
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def compile_where(where: dict[str, Any] | None) -> Column:
    """Compile a Prisma-style ``where`` dict to one Column predicate."""
    if not where:
        return F.lit(True)
    preds: list[Column] = []
    for key, spec in where.items():
        if key == "AND":
            sub = [compile_where(w) for w in (spec if isinstance(spec, list) else [spec])]
            p = sub[0]
            for s in sub[1:]:
                p = p & s
            preds.append(p)
        elif key == "OR":
            sub = [compile_where(w) for w in (spec if isinstance(spec, list) else [spec])]
            p = sub[0]
            for s in sub[1:]:
                p = p | s
            preds.append(p)
        elif key == "NOT":
            sub = [compile_where(w) for w in (spec if isinstance(spec, list) else [spec])]
            for s in sub:
                preds.append(~s)
        else:
            preds.append(_field_predicate(F.col(key), spec))
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


# --- ordering (SortOrderInput{sort, nulls}, commonInputTypes.ts:63-66) ----


def compile_order_by(order_by: list[dict[str, Any]] | dict[str, Any] | None) -> list[Column]:
    """Prisma orderBy → list of sort Columns with nulls placement.

    Accepts ``{"field": "asc"}`` shorthand or
    ``{"field": {"sort": "desc", "nulls": "last"}}``, or a list of those.
    """
    if order_by is None:
        return []
    items = order_by if isinstance(order_by, list) else [order_by]
    cols: list[Column] = []
    for item in items:
        for field, spec in item.items():
            if isinstance(spec, str):
                sort, nulls = spec, None
            else:
                sort, nulls = spec.get("sort", "asc"), spec.get("nulls")
            c = F.col(field)
            if sort == "asc":
                cols.append(
                    c.asc_nulls_first() if nulls == "first"
                    else c.asc_nulls_last() if nulls == "last"
                    else c.asc()
                )
            elif sort == "desc":
                cols.append(
                    c.desc_nulls_first() if nulls == "first"
                    else c.desc_nulls_last() if nulls == "last"
                    else c.desc()
                )
            else:
                raise ValueError(f"bad sort direction {sort!r}")
    return cols
