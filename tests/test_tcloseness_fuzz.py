"""Spec-level fuzz for q274 (t-closeness EMD, m84).

An independent mirror re-derives the Li et al. (ICDE'07) ordered-EMD
from the spec: per group, bucket shares p_b and global shares q_b over
the FULL fixed bucket domain 0..4, cumulative difference cd_i =
Σ_{j<=i}(p_j − q_j), EMD = Σ_i |cd_i| / (m − 1) over ALL m domain
positions.  The implementation densifies the grid over OBSERVED
buckets only — a bucket with zero global count contributes its |cd|
(constant through the gap) to the spec sum but is absent from the
implementation's.  Real TPC-H acctbal data observes every bucket ≥ 1
and bucket 0's cd is always 0 there, so the 299-query differential
can never see the difference; this fuzz drives sparse bucket
histograms where it shows.

Float discipline: the mirror accumulates p−q in bucket order exactly
as the window does; the final Σ|cd| is compared at 1e-9 and the
breach flag is only asserted away from the t=0.2 boundary.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_NB = 5
_T = 0.2


def _bucket(acctbal: float) -> int:
    return min(int(math.floor(acctbal / 2500.0)) + 2, _NB - 1)


def _mirror(rows):
    """rows: (nationkey, acctbal_cents).  Returns {grp: (emd, breach)}
    computed over the FULL 0..4 bucket domain."""
    from collections import defaultdict

    g = defaultdict(lambda: defaultdict(int))
    glob = defaultdict(int)
    for nk, cents in rows:
        b = _bucket(cents / 100.0)
        g[nk][b] += 1
        glob[b] += 1
    tn = sum(glob.values())
    out = {}
    for grp, hist in g.items():
        gn = sum(hist.values())
        cd = 0.0
        s = 0.0
        for b in range(_NB):
            cd += hist.get(b, 0) / gn - glob.get(b, 0) / tn
            s += abs(cd)
        emd = s / (_NB - 1)
        out[grp] = (emd, emd > _T)
    return out


# acctbal in the TPC-H envelope [-999.99, 9999.99] -> buckets 1..4;
# plus a wider variant reaching bucket 0.  Coarse value grid so whole
# buckets go unobserved (the divergence case).
_rows = st.lists(
    st.tuples(
        st.integers(0, 3),                      # nationkey group
        st.sampled_from([-99_999, -10_000, 1, 240_000, 250_001, 499_999,
                         510_000, 740_000, 760_000, 999_999]),  # cents
    ),
    min_size=1,
    max_size=60,
)


@SLOW
@given(_rows)
def test_q274_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m84_governance2 as m

    df = spark.createDataFrame(
        [
            (i, f"c{i}", nk, cents / 100.0, "SEG")
            for i, (nk, cents) in enumerate(rows)
        ],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        r["group_id"]: (r["emd"], r["breach"])
        for r in m.q274_t_closeness(spark, "unused").collect()
    }
    want = _mirror(rows)
    assert set(got) == set(want)
    for grp, (emd, breach) in want.items():
        # the query emits round(emd, 6): allow half a 6-decimal ulp
        assert abs(got[grp][0] - emd) < 5.001e-7, (grp, got[grp][0], emd)
        if abs(emd - _T) > 1e-6:
            assert got[grp][1] == breach, (grp, emd)
