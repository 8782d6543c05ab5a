"""Spec-level fuzz for q214 (data-contract expectations runner, m54).

An independent mirror re-derives all six contracts over rows with
NULLs in every column: the five row-level checks count a NULL
predicate as a FAILURE (CASE WHEN pred THEN 0 ELSE 1 — the
three-valued-logic trap a bare boolean cast would get wrong), and the
uniqueness check groups NULL orderkeys together (SQL GROUP BY
semantics).  Both engines share the predicate list, so a shared 3VL
or domain mistake would pass the differential; this mirror catches it.
"""

from __future__ import annotations

import datetime
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_D1990 = datetime.datetime(1990, 1, 1)


def _mirror(rows):
    def fail(pred):
        return sum(0 if p else 1 for p in pred)

    checks = [
        ("orderkey_not_null", [r[0] is not None for r in rows]),
        ("totalprice_positive",
         [r[1] is not None and r[1] > 0 for r in rows]),
        ("status_in_domain",
         [r[2] is not None and r[2] in ("F", "O", "P") for r in rows]),
        ("priority_in_domain",
         [r[3] is not None and re.search(r"^.-", r[3]) is not None for r in rows]),
        ("date_in_range", [r[4] is not None and r[4] >= _D1990 for r in rows]),
    ]
    n = len(rows)
    out = [(name, fail(p), n, fail(p) == 0) for name, p in checks]
    from collections import Counter

    keys = Counter(r[0] for r in rows)  # NULL keys group together
    dups = sum(1 for c in keys.values() if c > 1)
    out.append(("orderkey_unique", dups, n, dups == 0))
    return sorted(out)


_row = st.tuples(
    st.one_of(st.none(), st.integers(0, 5)),                     # orderkey
    st.one_of(st.none(), st.sampled_from([-1.5, 0.0, 10.25])),   # totalprice
    st.one_of(st.none(), st.sampled_from(["F", "O", "P", "X"])), # status
    st.one_of(st.none(), st.sampled_from(["1-URGENT", "URGENT", "-", "2-HIGH", ""])),
    st.one_of(
        st.none(),
        st.sampled_from(
            [datetime.datetime(1989, 12, 31), _D1990, datetime.datetime(1995, 6, 1)]
        ),
    ),
)


@SLOW
@given(st.lists(_row, min_size=1, max_size=30))
def test_q214_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m54_linkpred_expect as m

    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_totalprice double, o_orderstatus string,"
        " o_orderpriority string, o_orderdate timestamp",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["check_name"], r["fails"], r["n_rows"], r["passed"])
        for r in m.q214_expectations(spark, "unused").collect()
    )
    assert got == _mirror(rows)
