"""Spec-level fuzz for q200 (grouping-sets marginals, m47) and q201
(watermark lateness audit, m47).

q200's mirror computes the three marginal tables independently and
labels them with the grouping-id arithmetic — the fuzz feeds a literal
'ALL' as a DATA value, which only the gid bits can tell apart from a
rollup NULL.  q201's mirror replays arrival order (event_id) per
type: running high-water mark over STRICTLY PRIOR events, lateness
only when the mark exists and exceeds the event time, and the
DISCRETE 99th percentile (smallest value at cumulative rank >= 0.99)
— an interpolated-percentile or current-row-inclusive mistake shared
by both engines would diverge here.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_US = 1_704_067_200_000_000


# ---------------------------------------------------------------- q200

def _mirror_gsets(rows):
    out = []
    by_s = defaultdict(lambda: [0, 0])
    by_p = defaultdict(lambda: [0, 0])
    by_sp = defaultdict(lambda: [0, 0])
    for s, p, cents in rows:
        for d, k in ((by_s, s), (by_p, p), (by_sp, (s, p))):
            d[k][0] += 1
            d[k][1] += cents
    # gid bits: grouping(status)*2 + grouping(priority); grouping()=1
    # when the column is rolled up in that set
    for s, (n, rc) in by_s.items():
        out.append((s, "ALL", 1, n, rc))
    for p, (n, rc) in by_p.items():
        out.append(("ALL", p, 2, n, rc))
    for (s, p), (n, rc) in by_sp.items():
        out.append((s, p, 0, n, rc))
    return sorted(out)


_gs_rows = st.lists(
    st.tuples(
        st.sampled_from(["F", "O", "ALL"]),       # status incl literal 'ALL'
        st.sampled_from(["1-URGENT", "ALL"]),     # priority incl literal 'ALL'
        st.integers(-500, 5_000),
    ),
    min_size=1,
    max_size=40,
)


@SLOW
@given(_gs_rows)
def test_q200_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m47_windows_ooo as m

    df = spark.createDataFrame(
        [(i, s, p, c / 100.0) for i, (s, p, c) in enumerate(rows)],
        "o_orderkey long, o_orderstatus string, o_orderpriority string,"
        " o_totalprice double",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["status"], r["priority"], r["gid"], r["n"], r["revenue_cents"])
        for r in m.q200_grouping_sets(spark, "unused").collect()
    )
    assert got == _mirror_gsets(rows)


# ---------------------------------------------------------------- q201

def _mirror_watermark(rows):
    by_type = defaultdict(list)
    for eid, et, s in rows:
        by_type[et].append((eid, s))
    out = []
    for et, evs in by_type.items():
        evs.sort()  # arrival order = event_id
        late = []
        hwm = None
        for _eid, s in evs:
            us = s * 1_000_000
            late.append(hwm - us if hwm is not None and us < hwm else 0)
            hwm = us if hwm is None else max(hwm, us)
        n = len(late)
        n_late = sum(1 for v in late if v > 0)
        xs = sorted(late)
        p99 = xs[max(0, math.ceil(0.99 * n) - 1)]
        out.append(
            (et, n, n_late, n_late / n,
             math.floor(max(late) / 1e6 + 0.5), math.floor(p99 / 1e6 + 0.5))
        )
    return sorted(out)


_wm_rows = st.lists(
    st.tuples(
        st.integers(0, 9_999),                    # event_id (arrival order)
        st.sampled_from(["a", "b"]),
        st.integers(0, 4_000),                    # event-time seconds
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@SLOW
@given(_wm_rows)
def test_q201_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m47_windows_ooo as m

    df = spark.createDataFrame(
        [(eid, et, _US + s * 1_000_000) for eid, et, s in rows],
        "event_id long, event_type string, us long",
    ).select("event_id", "event_type", F.timestamp_micros(F.col("us")).alias("ts"))
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["etype"], r["n"], r["n_late"], r["late_share"],
         r["max_late_s"], r["p99_late_s"])
        for r in m.q201_watermark_audit(spark, "unused").collect()
    )
    want = _mirror_watermark(rows)
    assert [(e, n, nl, mx, p99) for e, n, nl, _, mx, p99 in got] == [
        (e, n, nl, mx, p99) for e, n, nl, _, mx, p99 in want
    ]
    for (_, _, _, gs, _, _), (_, _, _, ws, _, _) in zip(got, want):
        assert abs(gs - ws) < 5.001e-7
