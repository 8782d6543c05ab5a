"""Estimator fuzz for the m43/m86 governance kernels (q188, q278).

Both kernels and their DuckDB oracles share the SAME algebraic
derivation (the grouped-jackknife identity; the co-moment OLS closed
form), so the differential cannot catch a shared derivation mistake.
Mirrors here are derivation-independent:

* q188 — delete-one-group means and the DIRECT squared-deviation sum in
  exact ``Fraction`` arithmetic (the kernel uses the
  g·Σm² − (Σm)² identity on micro-fixed-point integers; they agree to
  the fixed-point snap, gated at 1e-6 relative).
* q278 — ``numpy.polyfit`` degree-1 slope (SVD-based least squares, a
  different algorithm entirely), gated at 1e-9 relative.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_US_2024 = 1_704_067_200_000_000


def _stratum(orderkey: int) -> int:
    h = hashlib.md5(f"jk:{orderkey}".encode()).hexdigest()[:8]
    return int(h, 16) % 10


def _jk_mirror(rows):
    """rows: (o_orderkey, cents).  Exact-Fraction grouped jackknife with
    the DIRECT deviation sum over the micro-snapped delete-one means."""
    strata = defaultdict(lambda: [0, 0])
    for ok, c in rows:
        s = strata[_stratum(ok)]
        s[0] += c
        s[1] += 1
    ts = sum(s for s, _ in strata.values())
    tn = sum(n for _, n in strata.values())
    # micro fixed-point snap, same HALF_UP rounding as F.round
    def snap(fr: Fraction) -> int:
        scaled = fr * 1_000_000
        fl = math.floor(scaled)
        rem = scaled - fl
        if rem > Fraction(1, 2):
            return fl + 1
        if rem < Fraction(1, 2):
            return fl
        return fl + 1 if fl >= 0 else fl  # HALF_UP on .5 exactly
    ms = [
        snap(Fraction(ts - sc, tn - n))
        for sc, n in strata.values()
        if tn - n > 0
    ]
    g = len(ms)
    mean_m = Fraction(sum(ms), g)
    dev = sum((Fraction(m) - mean_m) ** 2 for m in ms)
    se = math.sqrt(float(Fraction(g - 1, g) * dev / g)) / 1e6
    return tn, ts / tn, se


_jk_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(0, 100_000)),
    min_size=12,
    max_size=60,
    unique_by=lambda r: r[0],
).filter(lambda rs: len({_stratum(ok) for ok, _ in rs}) >= 2)


@SLOW
@given(_jk_rows)
def test_q188_matches_fraction_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m43_governance_stats as m

    df = spark.createDataFrame(
        [(ok, c / 100.0) for ok, c in rows], "o_orderkey long, o_totalprice double"
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    row = m.q188_jackknife_ci(spark, "unused").collect()[0]
    tn, mean, se = _jk_mirror(rows)
    assert row["n_orders"] == tn
    assert math.isclose(row["mean_cents"], round(mean, 2), abs_tol=0.011)
    # kernel snaps means to 1e-6 BEFORE the deviation sum and rounds the
    # SE to 2 decimals; mirror is exact — allow the snap+round slack
    assert math.isclose(row["jk_se_cents"], se, rel_tol=1e-4, abs_tol=0.011)


def _ols_mirror(rows):
    """rows: (user_id, minute, cents) pre-filtered to %29==0 users."""
    import numpy as np

    by_user = defaultdict(list)
    for u, mi, c in rows:
        by_user[u].append((mi, c))
    out = {}
    for u, pts in by_user.items():
        xs = np.array([m for m, _ in pts], dtype=float)
        ys = np.array([c for _, c in pts], dtype=float)
        if len(xs) < 2 or np.all(xs == xs[0]):
            continue
        out[u] = (len(pts), float(np.polyfit(xs, ys, 1)[0]))
    return out


_ols_rows = st.lists(
    st.tuples(
        st.sampled_from([0, 29, 58]),
        st.integers(0, 500),      # minute offset
        st.integers(-1000, 1000),  # cents
    ),
    min_size=2,
    max_size=40,
)


@SLOW
@given(_ols_rows)
def test_q278_matches_numpy_polyfit(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m86_backpressure_grouped as m

    df = spark.createDataFrame(
        [
            (i, u, _US_2024 + mi * 60_000_000, "click", c / 100.0)
            for i, (u, mi, c) in enumerate(rows)
        ],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        "value",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        r["user_id"]: (r["n"], r["slope"])
        for r in m.q278_grouped_ols_slopes(spark, "unused").collect()
    }
    want = _ols_mirror(rows)
    assert got.keys() == want.keys()
    for u in want:
        assert got[u][0] == want[u][0]
        assert math.isclose(got[u][1], want[u][1], rel_tol=1e-9, abs_tol=1e-9)
