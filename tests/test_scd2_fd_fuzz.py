"""Spec-level fuzz for the m92 wave (q290 FD repair, q291 SCD-2 join).

The sf0.01 oracle differential runs the SAME predicates in DuckDB, so
a shared spec mistake (boundary ties at version change points, events
before the first version, majority-vote tie direction) would pass it
on both sides.  These tests check against independent Python mirrors
built from the spec prose on crafted + hypothesis-random inputs."""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_US_2024 = 1_704_067_200_000_000  # 2024-01-01 UTC


def _events_df(spark, rows):
    # rows: (event_id, user_id, minute_offset, value)
    return spark.createDataFrame(
        [
            (e, u, _US_2024 + m * 60_000_000, "click", v)
            for e, u, m, v in rows
        ],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        "value",
    )


def _scd2_mirror(rows):
    """Spec: versions = every 4th event id's ts per user (ordered by
    ts, event_id), version i valid [ts_i, ts_{i+1}); each event of the
    user lands in the version containing its ts (events before the
    first change point match nothing).  Returns
    {(user, version): (n_events, cents)}."""
    by_user = defaultdict(list)
    for e, u, m, v in rows:
        by_user[u].append((e, m, v))
    out = {}
    for u, evs in by_user.items():
        pts = sorted(((m, e) for e, m, v in evs if e % 4 == 0))
        if not pts:
            continue
        for e, m, v in evs:
            # last change point with ts <= event ts (ties: the version
            # STARTING at this ts wins — [from, to) containment)
            ver = None
            for i, (pm, _pe) in enumerate(pts):
                if m >= pm:
                    ver = i + 1
                else:
                    break
            if ver is None:
                continue
            n, c = out.get((u, ver), (0, 0))
            out[(u, ver)] = (n + 1, c + round(v * 100))
    return out


# user_id must be % 19 == 0 to pass the query's filter; minute offsets
# deliberately collide so events tie change points exactly
_scd_rows = st.lists(
    st.tuples(
        st.integers(0, 40),          # event_id (duplicates filtered below)
        st.sampled_from([0, 19, 38]),
        st.integers(0, 6),           # minute offset — heavy ts ties
        st.integers(0, 1000),        # cents — exact, so round(v*100) is
                                     # engine-independent
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],
)


@SLOW
@given(_scd_rows)
def test_q291_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m92_repair_scd2 as m

    rows = [(e, u, mi, cents / 100.0) for e, u, mi, cents in rows]
    df = _events_df(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        (r["user_id"], r["version"]): (r["n_events"], r["cents"])
        for r in m.q291_scd2_temporal_join(spark, "unused").collect()
    }
    assert got == _scd2_mirror(rows)


def _fd_mirror(orders, segs):
    """Spec: corrupt seg of orders with o_orderkey%23==0, majority-vote
    per custkey (ties -> lexicographically smallest seg), repaired
    per-segment (n_orders, n_repaired)."""
    votes = defaultdict(Counter)
    rows = []
    for ok, ck in orders:
        seg = "CORRUPTED" if ok % 23 == 0 else segs[ck]
        votes[ck][seg] += 1
        rows.append((ck, seg))
    elect = {
        ck: min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for ck, c in votes.items()
    }
    out = defaultdict(lambda: [0, 0])
    for ck, seg in rows:
        f = elect[ck]
        out[f][0] += 1
        out[f][1] += int(seg != f)
    return {k: tuple(v) for k, v in out.items()}


_fd_case = st.tuples(
    st.lists(st.integers(0, 4), min_size=1, max_size=5),  # seg per custkey
    st.lists(
        st.tuples(st.integers(0, 120), st.integers(0, 4)),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    ),
)


@SLOW
@given(_fd_case)
def test_q290_matches_spec_mirror(spark, monkeypatch, case):
    import lawfirm_data_pipeline_spark.oracle.m92_repair_scd2 as m

    seg_codes, orders = case
    segs = {i: f"SEG{c}" for i, c in enumerate(seg_codes)}
    orders = [(ok, ck % len(seg_codes)) for ok, ck in orders]
    odf = spark.createDataFrame(
        [(ok, ck) for ok, ck in orders], "o_orderkey long, o_custkey long"
    )
    cdf = spark.createDataFrame(
        [(ck, s) for ck, s in segs.items()], "c_custkey long, c_mktsegment string"
    )
    tables = {"orders": odf, "customer": cdf}
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: tables[n])
    got = {
        r["seg"]: (r["n_orders"], r["n_repaired"])
        for r in m.q290_fd_majority_repair(spark, "unused").collect()
    }
    assert got == _fd_mirror(orders, segs)
