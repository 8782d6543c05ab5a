"""Spec-level fuzz for q188 (jackknife SE, m43) and q192 (Benford
audit, m44).

Independent Python mirrors re-derive both from the spec — q188: md5
strata, exact per-stratum (sum, count), leave-one-out means snapped to
micro fixed-point, deviation sum via the g·Σm² − (Σm)² identity with
arbitrary-precision integers (Python ints stand in for HUGEINT /
decimal(38,0)), sqrt only at the end; q192: first significant digit of
the cents grid, observed share vs log10(1 + 1/d), per-digit chi-square
contribution.  Both engines share one derivation (the same md5
stratum, the same identity), so the differential cannot catch a shared
mistake in the fixed-point snap or the variance identity; these
mirrors can.  Values are integer cents exactly (value = cents/100
round-trips through the engines' round(x*100)); sparse digit
histograms (not all of 1..9 observed) exercise the grouping.
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


def _orders_df(spark, rows):
    """rows: (o_orderkey, cents)."""
    return spark.createDataFrame(
        [(k, c / 100.0) for k, c in rows],
        "o_orderkey long, o_totalprice double",
    )


# ---------------------------------------------------------------- q188

def _mirror_jackknife(rows):
    strata = defaultdict(lambda: [0, 0])  # stratum -> [sum_cents, n]
    for k, c in rows:
        s = int(hashlib.md5(f"jk:{k}".encode()).hexdigest()[:8], 16) % 10
        strata[s][0] += c
        strata[s][1] += 1
    ts = sum(sc for sc, _ in strata.values())
    tn = sum(n for _, n in strata.values())
    m_fp = []
    for sc, n in strata.values():
        # round() on a positive double: both engines round half away
        # from zero; Python round is banker's, so do it explicitly
        x = (ts - sc) / (tn - n) * 1e6
        m_fp.append(math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5))
    g = len(m_fp)
    sm = sum(m_fp)
    sm2 = sum(v * v for v in m_fp)  # exact: Python int = HUGEINT
    se = math.sqrt((g - 1) / g * float(g * sm2 - sm * sm) / (float(g) * g)) / 1e6
    # mean is returned UNROUNDED: the query rounds half-up to 2
    # decimals and Python's round() is banker's (3.125 -> 3.12 vs the
    # engines' 3.13), so the caller compares at the 2-decimal half-ulp
    return (tn, ts / tn, se)


# >= 2 strata nonempty is guaranteed by >= 25 keys w.h.p.; leave-one-out
# needs tn > n per stratum, i.e. at least two nonempty strata — filter.
def _two_strata(rows):
    seen = {
        int(hashlib.md5(f"jk:{k}".encode()).hexdigest()[:8], 16) % 10
        for k, _ in rows
    }
    return len(seen) >= 2


_jk_rows = st.lists(
    st.tuples(st.integers(0, 100_000), st.integers(1, 2_000_000)),
    min_size=2,
    max_size=40,
    unique_by=lambda t: t[0],
).filter(_two_strata)


@SLOW
@given(_jk_rows)
def test_q188_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m43_governance_stats as m

    df = _orders_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    [r] = m.q188_jackknife_ci(spark, "unused").collect()
    tn, mean_cents, se = _mirror_jackknife(rows)
    assert r["n_orders"] == tn
    assert abs(r["mean_cents"] - mean_cents) < 5.001e-3
    assert abs(r["jk_se_cents"] - se) < 5.001e-3  # query rounds to 2


# ---------------------------------------------------------------- q192

def _mirror_benford(rows):
    g = defaultdict(int)
    for _k, c in rows:
        g[int(str(c)[0])] += 1
    tot = sum(g.values())
    out = []
    for d, n in g.items():
        b = math.log10(1 + 1.0 / d)
        out.append((d, n, n / tot, b, (n - tot * b) ** 2 / (tot * b)))
    return sorted(out)


@SLOW
@given(_jk_rows)
def test_q192_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m44_seasonal_privacy as m

    df = _orders_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["digit"], r["n"], r["share"], r["benford"], r["chi2_term"])
        for r in m.q192_benford_audit(spark, "unused").collect()
    )
    want = _mirror_benford(rows)
    assert [(d, n) for d, n, *_ in got] == [(d, n) for d, n, *_ in want]
    for (_, _, gs, gb, gc), (_, _, ws, wb, wc) in zip(got, want):
        assert abs(gs - ws) < 5.001e-7
        assert abs(gb - wb) < 5.001e-7
        assert abs(gc - wc) < 5.001e-7
