"""Spec-level fuzz for q193 (Neyman allocation) and q194
(capture-recapture), m45.

Independent Python mirrors: q193 re-derives per-stratum exact
cent-grid moments, the (Σx² − (Σx)²/n)/(n−1) sample variance, and the
n·N_h·S_h/Σ allocation; q194 re-derives the md5 capture memberships
with hashlib and the Lincoln-Petersen N̂ = |A||B|/|A∩B| plus its audit
columns.  Small stratified inputs exercise the nh>=2 filter (singleton
strata must vanish from the output) and capture overlaps down to a
single shared key.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------- q193

def _mirror_neyman(rows):
    s = defaultdict(lambda: [0, 0, 0])  # nat -> [nh, sc, sc2]
    for nat, cents in rows:
        s[nat][0] += 1
        s[nat][1] += cents
        s[nat][2] += cents * cents
    v = {}
    for nat, (nh, sc, sc2) in s.items():
        if nh >= 2:
            v[nat] = (nh, math.sqrt((sc2 - float(sc) * sc / nh) / (nh - 1)))
    denom = sum(nh * sd for nh, sd in v.values())
    return {
        nat: (nh, sd / 100, nh * sd / denom, 1000 * nh * sd / denom)
        for nat, (nh, sd) in v.items()
    }


_ney_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-99_999, 999_999)),
    min_size=2,
    max_size=40,
).filter(
    # at least one stratum with nh>=2 AND nonzero variance, else denom=0
    lambda rs: any(
        len({c for n2, c in rs if n2 == n}) >= 2
        and sum(1 for n2, _ in rs if n2 == n) >= 2
        for n in {n for n, _ in rs}
    )
)


@SLOW
@given(_ney_rows)
def test_q193_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m45_estimation as m

    df = spark.createDataFrame(
        [(i, nk, c / 100.0) for i, (nk, c) in enumerate(rows)],
        "c_custkey long, c_nationkey long, c_acctbal double",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        r["nat"]: (r["nh"], r["sd_bal"], r["weight"], r["alloc"])
        for r in m.q193_neyman_allocation(spark, "unused").collect()
    }
    want = _mirror_neyman(rows)
    assert set(got) == set(want)
    for nat, (nh, sd_bal, weight, alloc) in want.items():
        g = got[nat]
        assert g[0] == nh
        assert abs(g[1] - sd_bal) < 5.001e-5   # query rounds to 4
        assert abs(g[2] - weight) < 5.001e-7   # query rounds to 6
        assert abs(g[3] - alloc) <= 0.5 + 1e-6  # integer round of alloc
        assert isinstance(g[3], int)


# ---------------------------------------------------------------- q194

def _capt(salt: str, key: int) -> bool:
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8], 16) % 100 < 20


def _mirror_capture(keys):
    ks = sorted(set(keys))
    na = sum(1 for k in ks if _capt("capA", k))
    nb = sum(1 for k in ks if _capt("capB", k))
    nab = sum(1 for k in ks if _capt("capA", k) and _capt("capB", k))
    n_true = len(ks)
    est = na * nb / nab
    return (n_true, na, nb, nab, est, abs(est - n_true) / n_true)


_cap_keys = st.lists(
    st.integers(0, 1_000_000), min_size=1, max_size=200
).filter(lambda ks: any(_capt("capA", k) and _capt("capB", k) for k in ks))


@SLOW
@given(_cap_keys)
def test_q194_matches_spec_mirror(spark, monkeypatch, keys):
    import lawfirm_data_pipeline_spark.oracle.m45_estimation as m

    # duplicates exercise the DISTINCT leg
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys + keys[:5])],
        "l_linenumber long, l_orderkey long",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    [r] = m.q194_capture_recapture(spark, "unused").collect()
    n_true, na, nb, nab, est, rel = _mirror_capture(keys)
    assert (r["n_true"], r["na"], r["nb"], r["nab"]) == (n_true, na, nb, nab)
    assert abs(r["n_est"] - est) <= 0.5 + 1e-6
    assert abs(r["rel_error"] - rel) < 5.001e-7
