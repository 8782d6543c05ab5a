"""Spec-level fuzz for q209 (Z-order vs linear zone-prune audit, m51)
and q211 (skew salt planner, m52).

q209's mirror re-derives the Morton interleave bit-by-bit (x on even,
y on odd positions), the top-6-bit zone split for both layouts, zone
min/max boxes, and the box-miss prune rule — with points planted on
the predicate-box edges and with pre-1995 dates exercising the
positive-residue (pmod) day coordinate.  q211's mirror re-derives the
per-partition budget ceil(total/32/4), the hot-key filter (strictly
greater), and the per-key salt factor, with counts planted exactly ON
the budget boundary.
"""

from __future__ import annotations

import datetime
import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_BITS = 10
_X = (100, 150)
_Y = (200, 260)
_EPOCH = datetime.datetime(1995, 1, 1)


# ---------------------------------------------------------------- q209

def _morton(x: int, y: int) -> int:
    z = 0
    for i in range(_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _mirror_zorder(rows):
    pts = [(ck % 1024, ((days % 1024) + 1024) % 1024) for ck, days in rows]
    zones = defaultdict(list)
    for x, y in pts:
        zones[("zorder", _morton(x, y) >> (2 * _BITS - 6))].append((x, y))
        zones[("linear", x >> (_BITS - 6))].append((x, y))
    agg = defaultdict(lambda: [0, 0, 0])  # layout -> [zones, pruned, scanned]
    for (layout, _z), ps in zones.items():
        xs, ys = [p[0] for p in ps], [p[1] for p in ps]
        prunable = (
            max(xs) < _X[0] or min(xs) > _X[1]
            or max(ys) < _Y[0] or min(ys) > _Y[1]
        )
        a = agg[layout]
        a[0] += 1
        a[1] += prunable
        a[2] += 0 if prunable else len(ps)
    return sorted((l, z, p, s) for l, (z, p, s) in agg.items())


# custkeys / day offsets hugging the predicate box edges (99..151,
# 199..261) plus far points and NEGATIVE day offsets (pre-1995 dates,
# the pmod case)
_zrows = st.lists(
    st.tuples(
        st.one_of(st.integers(0, 2047),
                  st.integers(99, 151)),
        st.one_of(st.integers(-2100, 2100),
                  st.integers(199, 261)),
    ),
    min_size=1,
    max_size=50,
)


@SLOW
@given(_zrows)
def test_q209_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m51_zorder as m

    df = spark.createDataFrame(
        [(i, ck, _EPOCH + datetime.timedelta(days=days)) for i, (ck, days) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["layout"], r["n_zones"], r["n_pruned"], r["rows_scanned"])
        for r in m.q209_zorder_audit(spark, "unused").collect()
    )
    assert got == _mirror_zorder(rows)


# ---------------------------------------------------------------- q211

def _mirror_salt(keys):
    c = Counter(keys)
    total = sum(c.values())
    budget = math.ceil(total / 32 / 4)
    return sorted(
        (k, n, n / total, math.ceil(n / budget))
        for k, n in c.items()
        if n > budget
    )


@st.composite
def _salt_keys(draw):
    # a few keys with counts spanning the budget boundary: with total
    # around 128-512, budget = ceil(total/128) is 1-4, so singleton
    # keys sit exactly ON it
    n_hot = draw(st.integers(0, 2))
    keys = []
    for h in range(n_hot):
        keys += [1000 + h] * draw(st.integers(2, 60))
    keys += [draw(st.integers(0, 50)) for _ in range(draw(st.integers(1, 80)))]
    return keys


@SLOW
@given(_salt_keys())
def test_q211_matches_spec_mirror(spark, monkeypatch, keys):
    import lawfirm_data_pipeline_spark.oracle.m52_sharding as m

    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)],
        "l_linenumber long, l_suppkey long",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["key"], r["cnt"], r["share"], r["salt_factor"])
        for r in m.q211_salt_planner(spark, "unused").collect()
    )
    want = _mirror_salt(keys)
    assert [(k, n, s) for k, n, _, s in got] == [(k, n, s) for k, n, _, s in want]
    for (_, _, gs, _), (_, _, ws, _) in zip(got, want):
        assert abs(gs - ws) < 5.001e-7
