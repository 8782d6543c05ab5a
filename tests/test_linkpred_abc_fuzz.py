"""Spec-level fuzz for q213 (co-purchase link prediction, m54) and
q216 (ABC revenue classification, m55).

q213's mirror re-derives the whole candidate list from adjacency
sets: distinct co-purchase edges (parts < 60 on one order, src < dst),
undirected degrees, common-neighbor counts via set intersection (the
Spark plan enumerates wedges — an overcount there, e.g. from
non-distinct edges, would double-count neighbors), exact-integer
jaccard >= 1/5 threshold, and the already-linked LEFT-join flag.
q216's mirror re-derives the descending cumulative revenue walk with
the (rev desc, part) total order and the exact 10·cum <= 7/9·total
cross-multiplied cutoffs — boundary revenues planted ON the 70%/90%
lines.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------- q213

def _mirror_linkpred(rows):
    edges = set()
    byorder = defaultdict(set)
    for ok, pk in rows:
        if pk < 60:
            byorder[ok].add(pk)
    for parts in byorder.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = []
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            cn = len(adj[x] & adj[y])
            if cn == 0:
                continue
            union = len(adj[x]) + len(adj[y]) - cn
            if 5 * cn >= union:
                out.append((x, y, cn, cn / union, (x, y) in edges))
    return sorted(out)


_li_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 70)),  # (orderkey, partkey)
    min_size=2,
    max_size=40,
)


@SLOW
@given(_li_rows)
def test_q213_matches_adjacency_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m54_linkpred_expect as m

    df = spark.createDataFrame(
        [(ok, pk, i) for i, (ok, pk) in enumerate(rows)],
        "l_orderkey long, l_partkey long, l_linenumber long",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["x"], r["y"], r["cn"], r["jaccard"], r["already_linked"])
        for r in m.q213_link_prediction(spark, "unused").collect()
    )
    want = _mirror_linkpred(rows)
    assert [(x, y, cn, al) for x, y, cn, _, al in got] == [
        (x, y, cn, al) for x, y, cn, _, al in want
    ]
    for (_, _, _, gj, _), (_, _, _, wj, _) in zip(got, want):
        assert abs(gj - wj) < 5.001e-7


# ---------------------------------------------------------------- q216

def _mirror_abc(rows):
    rev = defaultdict(int)
    for pk, cents in rows:
        rev[pk] += cents
    total = sum(rev.values())
    order = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    agg = defaultdict(lambda: [0, 0])
    for pk, r in order:
        cum += r
        cls = "A" if 10 * cum <= 7 * total else ("B" if 10 * cum <= 9 * total else "C")
        agg[cls][0] += 1
        agg[cls][1] += r
    return sorted(
        (cls, n, rc, rc / total) for cls, (n, rc) in agg.items()
    )


@st.composite
def _abc_rows(draw):
    n = draw(st.integers(1, 25))
    rows = []
    for pk in range(n):
        # revenues from a coarse grid so 10*cum lands exactly ON
        # 7*total / 9*total boundaries regularly (<= vs < decides class)
        rows.append((pk, draw(st.sampled_from([0, 100, 200, 300, 700, 900, 1000]))))
    return rows


@SLOW
@given(_abc_rows().filter(lambda rs: sum(c for _, c in rs) > 0))
def test_q216_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m55_segmentation as m

    df = spark.createDataFrame(
        [(pk, i, c / 100.0) for i, (pk, c) in enumerate(rows)],
        "l_partkey long, l_linenumber long, l_extendedprice double",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["cls"], r["n_parts"], r["revenue_cents"], r["revenue_share"])
        for r in m.q216_abc_classification(spark, "unused").collect()
    )
    want = _mirror_abc(rows)
    assert [(c, n, rc) for c, n, rc, _ in got] == [(c, n, rc) for c, n, rc, _ in want]
    for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
        assert abs(gs - ws) < 5.001e-7
