"""Spec-level fuzz for q196 (heavy-hitter join-cardinality estimate,
m45).

An independent mirror re-derives the whole estimator: per-key counts,
the top-20 by (count desc, key) sketch, the exact head product-sum,
the uniform-tail term round(avg_tail_mult × Σ cb over non-head keys),
and the audited truth Σ ca·cb.  The Spark plan assembles this from
five cached-branch aggregates and a left-anti join; the SQL states it
as correlated subqueries — a shared mistake in the head/tail split or
the NULL ladder (no tail A keys → nullif; no tail B keys → coalesce)
would agree on both engines and disagree here.  Skewed and uniform
key histograms, head/tail boundary ties, and degenerate no-tail
shapes are all driven.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_TOPK = 20


def _mirror(a_keys, b_keys):
    ca = Counter(a_keys)
    cb = Counter(b_keys)
    actual = sum(n * cb[k] for k, n in ca.items() if k in cb)
    head = sorted(ca, key=lambda k: (-ca[k], k))[:_TOPK]
    hs = set(head)
    e_exact = sum(ca[k] * cb[k] for k in head if k in cb)
    tot, nk = sum(ca.values()), len(ca)
    toptot, topn = sum(ca[k] for k in head), len(head)
    cb_tail = sum(n for k, n in cb.items() if k not in hs)
    if nk - topn == 0 or cb_tail == 0:
        # nullif -> NULL, or NULL cb_tail propagates; both coalesce to 0
        tail = 0
    else:
        x = (tot - toptot) / (nk - topn) * cb_tail
        tail = int(x + 0.5)  # round half-up on a positive double
    est = e_exact + tail
    return (actual, est, abs(float(est) - actual) / actual)


@st.composite
def _tables(draw):
    # keys from a small domain so a/b overlap; duplicate-heavy so the
    # head/tail split and (count desc, key) ties are exercised.  Domain
    # can exceed TOPK (real tail) or stay below it (no tail).
    dom = draw(st.integers(3, 35))
    a = draw(st.lists(st.integers(0, dom), min_size=1, max_size=120))
    b = draw(st.lists(st.integers(0, dom), min_size=1, max_size=40))
    return a, b


@SLOW
@given(_tables().filter(lambda ab: set(ab[0]) & set(ab[1])))
def test_q196_matches_spec_mirror(spark, monkeypatch, ab):
    import lawfirm_data_pipeline_spark.oracle.m45_estimation as m

    a_keys, b_keys = ab
    li = spark.createDataFrame(
        [(i, k) for i, k in enumerate(a_keys)], "l_linenumber long, l_suppkey long"
    )
    su = spark.createDataFrame(
        [(i, k) for i, k in enumerate(b_keys)], "s_dummy long, s_suppkey long"
    )
    monkeypatch.setattr(
        m, "load_table",
        lambda sp, sf, n, **kw: li if n == "lineitem" else su,
    )
    [r] = m.q196_join_card_estimate(spark, "unused").collect()
    actual, est, rel = _mirror(a_keys, b_keys)
    assert r["actual"] == actual
    assert r["estimate"] == est, (r["estimate"], est)
    assert abs(r["rel_error"] - rel) < 5.001e-7
