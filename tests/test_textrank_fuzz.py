"""q221 TextRank end-to-end spec mirror (r9 verdict task #6).

The DuckDB oracle for q221 UNROLLS the same derivation the Spark plan
executes (edge spec + 3 integer fixed-point PageRank rounds), so the
driver differential cannot catch a shared spec mistake.  This mirror
re-derives the whole pipeline in plain Python dicts from the PUBLISHED
spec (Mihalcea & Tarau 2004 adjacency graph; the pico fixed-point
recurrence r' = (15·unit) div 100 + (85·Σ r_u div d_u) div 100) and
compares exactly: words, rank_fp values, and tie-broken positions.

Random corpora are drawn from a SMALL alphabet so rank ties are
common — the (rank desc, word) tie-break is part of the contract.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lawfirm_data_pipeline_spark.operators.graph_metrics import PAGERANK_SCALE

_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]


def _mirror(texts: list[str], min_count: int, topk: int, iters: int = 3):
    toks = [t.lower().split() for t in texts]
    from collections import Counter

    vocab = {w for w, c in Counter(w for ts in toks for w in ts).items() if c >= min_count}
    edges = set()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            if a != b and a in vocab and b in vocab:
                edges.add((min(a, b), max(a, b)))
    und: dict[str, list[str]] = {}
    for a, b in edges:
        und.setdefault(a, []).append(b)
        und.setdefault(b, []).append(a)
    if not und:
        return []
    n = len(und)
    unit = PAGERANK_SCALE // n
    d = {u: len(vs) for u, vs in und.items()}
    r = {u: unit for u in und}
    base = (15 * unit) // 100
    for _ in range(iters):
        s = {u: 0 for u in und}
        for u, vs in und.items():
            c = r[u] // d[u]
            for v in vs:
                s[v] += c
        r = {u: base + (85 * s[u]) // 100 for u in und}
    ranked = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return [(w, fp, i + 1) for i, (w, fp) in enumerate(ranked)]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=2, max_size=12),
        min_size=2,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_q221_matches_plain_python_mirror(spark, docs_words, min_count):
    import lawfirm_data_pipeline_spark.oracle.m58_textrank as m

    texts = [" ".join(ws) for ws in docs_words]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(m, "_MIN_COUNT", min_count)
        mp.setattr(m, "load_table", lambda sp, sf, nm, **kw: df)
        got = [
            (r["word"], r["rank_fp"], r["rnk"])
            for r in sorted(
                m.q221_textrank_keywords(spark, "unused").collect(),
                key=lambda r: r["rnk"],
            )
        ]
    finally:
        mp.undo()
    want = _mirror(texts, min_count, m._TOPK)
    assert got == want
