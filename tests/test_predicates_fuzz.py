"""Hypothesis fuzz for the Prisma where-compiler (predicates.py).

Random filter trees (scalar shorthand, operator dicts, insensitive
mode, AND/OR/NOT nesting) are evaluated two ways over a fixed table
containing NULLs in every column:

* compiled by ``compile_where`` and run as a Spark filter;
* interpreted by an independent Python mirror implementing Prisma's
  documented semantics on SQL three-valued (Kleene) logic — NULL
  comparisons yield UNKNOWN, ``equals: null`` / ``not: null`` are the
  null-AWARE forms, and a filter keeps only rows that evaluate TRUE.

The reference's own behavior is the Prisma engine's SQL generation
(src/db/client/commonInputTypes.ts:18-155); the mirror encodes that
contract, so any divergence is a compiler bug, not a modeling choice.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lawfirm_data_pipeline_spark.predicates import compile_where

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_ROWS = [
    (0, 5, "Alpha"),
    (1, None, "beta"),
    (2, 7, None),
    (3, 0, "ALPHA"),
    (4, -3, "gamma ray"),
    (5, 7, ""),
    (6, None, None),
    (7, 12, "Beta"),
]

# --- Kleene three-valued logic -------------------------------------------


def k_not(x):
    return None if x is None else (not x)


def k_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def k_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def _lower(v):
    return v.lower() if isinstance(v, str) else v


def eval_field(val, spec):
    if spec is None:
        return val is None
    if not isinstance(spec, dict):
        return None if val is None else val == spec
    ins = spec.get("mode") == "insensitive"
    base = _lower(val) if ins else val
    acc = True
    for op, v in spec.items():
        if op == "mode":
            continue
        if op == "equals":
            p = (val is None) if v is None else (
                None if val is None else base == (_lower(v) if ins else v)
            )
        elif op == "not":
            # null-aware for `not: null`; otherwise Kleene negation of
            # the nested spec evaluated WITHOUT inheriting mode
            p = (val is not None) if v is None else k_not(eval_field(val, v))
        elif op == "in":
            vv = [_lower(x) if ins else x for x in v]
            p = None if val is None else base in vv
        elif op == "notIn":
            vv = [_lower(x) if ins else x for x in v]
            p = None if val is None else base not in vv
        elif op in ("lt", "lte", "gt", "gte"):
            w = _lower(v) if ins else v
            if val is None or w is None:
                p = None
            else:
                p = {
                    "lt": base < w,
                    "lte": base <= w,
                    "gt": base > w,
                    "gte": base >= w,
                }[op]
        elif op == "contains":
            p = None if val is None else (_lower(v) if ins else v) in base
        elif op == "startsWith":
            p = None if val is None else base.startswith(_lower(v) if ins else v)
        elif op == "endsWith":
            p = None if val is None else base.endswith(_lower(v) if ins else v)
        else:  # pragma: no cover - strategy never generates others
            raise AssertionError(op)
        acc = k_and(acc, p)
    return acc


def eval_where(row, where):
    if not where:
        return True
    acc = True
    for key, spec in where.items():
        if key == "AND":
            subs = spec if isinstance(spec, list) else [spec]
            p = True
            for s in subs:
                p = k_and(p, eval_where(row, s))
        elif key == "OR":
            subs = spec if isinstance(spec, list) else [spec]
            p = False
            for s in subs:
                p = k_or(p, eval_where(row, s))
        elif key == "NOT":
            subs = spec if isinstance(spec, list) else [spec]
            p = True
            for s in subs:
                p = k_and(p, k_not(eval_where(row, s)))
        else:
            p = eval_field(row[key], spec)
        acc = k_and(acc, p)
    return acc


# --- strategies ------------------------------------------------------------

_INTS = st.sampled_from([0, 5, 7, -3, 12, 99])
_STRS = st.sampled_from(["alpha", "Alpha", "beta", "gamma", "a", ""])


def _int_spec():
    ops = st.fixed_dictionaries(
        {},
        optional={
            "equals": _INTS | st.none(),
            "not": _INTS | st.none(),
            "in": st.lists(_INTS, min_size=1, max_size=3),
            "notIn": st.lists(_INTS, min_size=1, max_size=3),
            "lt": _INTS,
            "lte": _INTS,
            "gt": _INTS,
            "gte": _INTS,
        },
    ).filter(lambda d: d)
    return st.none() | _INTS | ops


def _str_spec():
    ops = st.fixed_dictionaries(
        {},
        optional={
            "equals": _STRS | st.none(),
            "not": _STRS | st.none(),
            "in": st.lists(_STRS, min_size=1, max_size=3),
            "notIn": st.lists(_STRS, min_size=1, max_size=3),
            "contains": _STRS,
            "startsWith": _STRS,
            "endsWith": _STRS,
            "mode": st.just("insensitive"),
        },
    ).filter(lambda d: set(d) - {"mode"})
    return st.none() | _STRS | ops


def _where(depth: int = 2):
    leaf = st.fixed_dictionaries(
        {}, optional={"a": _int_spec(), "s": _str_spec()}
    ).filter(lambda d: d)
    if depth == 0:
        return leaf
    sub = _where(depth - 1)
    boolean = st.fixed_dictionaries(
        {},
        optional={
            "AND": st.lists(sub, min_size=1, max_size=2),
            "OR": st.lists(sub, min_size=1, max_size=2),
            "NOT": st.lists(sub, min_size=1, max_size=2),
            "a": _int_spec(),
            "s": _str_spec(),
        },
    ).filter(lambda d: d)
    return leaf | boolean


@SLOW
@given(where=_where())
def test_compile_where_matches_kleene_mirror(spark, where):
    df = spark.createDataFrame(_ROWS, "id long, a long, s string")
    got = sorted(r["id"] for r in df.filter(compile_where(where)).collect())
    rows = [{"id": i, "a": a, "s": s} for i, a, s in _ROWS]
    want = sorted(r["id"] for r in rows if eval_where(r, where) is True)
    assert got == want, where


# --- orderBy ---------------------------------------------------------------

_DIRS = st.sampled_from(["asc", "desc"])
_SPECS = _DIRS | st.fixed_dictionaries(
    {"sort": _DIRS}, optional={"nulls": st.sampled_from(["first", "last"])}
)


@SLOW
@given(
    order=st.lists(
        st.tuples(st.sampled_from(["a", "s"]), _SPECS),
        min_size=1,
        max_size=3,
        unique_by=lambda t: t[0],
    )
)
def test_compile_order_by_matches_mirror(spark, order):
    """Prisma orderBy (asc/desc shorthand + explicit nulls placement)
    against a Python sort mirror.  Spark defaults: asc -> nulls first,
    desc -> nulls last (matching Prisma's SQL generation)."""
    from lawfirm_data_pipeline_spark.predicates import compile_order_by

    order_by = [{f: s} for f, s in order]
    df = spark.createDataFrame(_ROWS, "id long, a long, s string")
    got = [r["id"] for r in df.orderBy(*compile_order_by(order_by), "id").collect()]

    def keys(row):
        out = []
        for f, s in order:
            sort = s if isinstance(s, str) else s["sort"]
            nulls = None if isinstance(s, str) else s.get("nulls")
            v = row[f]
            null_rank_first = 0 if v is None else 1
            null_rank_last = 1 if v is None else 0
            if nulls == "first":
                nr = null_rank_first
            elif nulls == "last":
                nr = null_rank_last
            else:  # Spark/Prisma default: asc=nulls first, desc=nulls last
                nr = null_rank_first if sort == "asc" else null_rank_last
            if v is None:
                out.append((nr, 0))
            else:
                # invert for desc on the value only, never the null rank
                out.append((nr, _Neg(v) if sort == "desc" else _Key(v)))
        out.append(row["id"])
        return out

    class _Key:
        def __init__(self, v):
            self.v = v

        def __lt__(self, o):
            return self.v < o.v

        def __eq__(self, o):
            return self.v == o.v

    class _Neg(_Key):
        def __lt__(self, o):
            return self.v > o.v

    rows = [{"id": i, "a": a, "s": s} for i, a, s in _ROWS]
    # mixed (nr, key-object) tuples: nr differs -> int compare decides;
    # nr equal and 0 (both null) -> second elements are equal ints
    want = [r["id"] for r in sorted(rows, key=keys)]
    assert got == want, order_by
