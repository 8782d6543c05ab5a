"""Spec-level fuzz for q199 (trailing-window event velocity, m47) and
q222 (order/line reconciliation, m59).

q199's RANGE frame semantics — timestamp ties are peers, so every
tied event counts every other — is brute-forced per event over
clustered and exactly-600s-apart offsets; a ROWS-frame or
half-open-window mistake shared by both engines would diverge here.
q222's mirror re-derives per-order line sums, the header LEFT join
(orphans kept), the 1-cent reconciliation tally (NULL deltas count in
neither leg), the interpolated median delta, and the all-orphan
degenerate shape where p50/max go NULL.  Monetary inputs are exact
binary fractions so per-line rounding is engine-independent.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_US = 1_704_067_200_000_000
_WIN_S = 600


# ---------------------------------------------------------------- q199

def _mirror_velocity(rows):
    from collections import Counter, defaultdict

    by_user = defaultdict(list)
    for uid, s in rows:
        by_user[uid].append(s)
    hist = Counter()
    for uid, ts in by_user.items():
        vel = max(sum(1 for t2 in ts if t - _WIN_S <= t2 <= t) for t in ts)
        hist[(vel, len(ts))] += 1
    out = defaultdict(lambda: [0, 0])
    for (vel, n_ev), n_users in hist.items():
        out[vel][0] += n_users
        out[vel][1] += n_ev * n_users
    return sorted((v, nu, ne) for v, (nu, ne) in out.items())


_vel_rows = st.lists(
    st.tuples(
        st.integers(0, 2),
        # offsets cluster around bucket-ish marks: ties and exact-600s
        # gaps both occur
        st.integers(0, 4).flatmap(
            lambda k: st.sampled_from(
                [k * _WIN_S, k * _WIN_S + 1, k * _WIN_S + 300, (k + 1) * _WIN_S]
            )
        ),
    ),
    min_size=1,
    max_size=40,
)


@SLOW
@given(_vel_rows)
def test_q199_matches_brute_force(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m47_windows_ooo as m

    df = spark.createDataFrame(
        [(i, uid, _US + s * 1_000_000) for i, (uid, s) in enumerate(rows)],
        "event_id long, user_id long, us long",
    ).select("event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts"))
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["max_velocity"], r["n_users"], r["n_events"])
        for r in m.q199_event_velocity(spark, "unused").collect()
    )
    assert got == _mirror_velocity(rows)


# ---------------------------------------------------------------- q222

def _half_up(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def _mirror_recon(orders, lines):
    from collections import defaultdict

    calc = defaultdict(int)
    for k, price, disc, tax in lines:
        calc[k] += _half_up(price * (1 - disc) * (1 + tax) * 100)
    deltas = []
    n_orphan = 0
    for k, o_cents in orders:
        if k in calc:
            deltas.append(abs(o_cents - calc[k]))
        else:
            n_orphan += 1
    n_rec = sum(1 for d in deltas if d <= 1)
    if deltas:
        xs = sorted(deltas)
        h = (len(xs) - 1) * 0.5
        lo = math.floor(h)
        med = xs[lo] if lo + 1 >= len(xs) else xs[lo] + (h - lo) * (xs[lo + 1] - xs[lo])
        p50, mx = _half_up(med), max(deltas)
    else:
        p50, mx = None, None
    return (len(orders), n_orphan, n_rec, p50, mx)


@st.composite
def _recon_tables(draw):
    n_o = draw(st.integers(1, 12))
    orders = []
    lines = []
    for k in range(n_o):
        # o_totalprice in exact cents
        o_cents = draw(st.integers(0, 40_000))
        orders.append((k, o_cents))
        n_l = draw(st.integers(0, 3))  # 0 lines -> orphan header
        for _ in range(n_l):
            price = draw(st.integers(0, 400)) * 0.25   # exact binary
            disc = draw(st.sampled_from([0.0, 0.25, 0.5]))
            tax = draw(st.sampled_from([0.0, 0.25]))
            lines.append((k, price, disc, tax))
    return orders, lines


@SLOW
@given(_recon_tables())
def test_q222_matches_spec_mirror(spark, monkeypatch, tables):
    import lawfirm_data_pipeline_spark.oracle.m59_reconciliation as m

    orders, lines = tables
    odf = spark.createDataFrame(
        [(k, c / 100.0) for k, c in orders],
        "o_orderkey long, o_totalprice double",
    )
    # lineitem may be empty: build from an explicit schema
    ldf = spark.createDataFrame(
        [(k, i, p, d, t) for i, (k, p, d, t) in enumerate(lines)],
        "l_orderkey long, l_linenumber long, l_extendedprice double,"
        " l_discount double, l_tax double",
    )
    monkeypatch.setattr(
        m, "load_table",
        lambda sp, sf, n, **kw: odf if n == "orders" else ldf,
    )
    [r] = m.q222_order_reconciliation(spark, "unused").collect()
    n_orders, n_orphan, n_rec, p50, mx = _mirror_recon(orders, lines)
    assert (r["n_orders"], r["n_no_items"], r["n_reconciled"]) == (
        n_orders, n_orphan, n_rec,
    )
    assert r["p50_delta_cents"] == p50
    assert r["max_delta_cents"] == mx
