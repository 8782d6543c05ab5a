"""Spec-level fuzz for q272 (Matryoshka truncation audit, m83).

An independent sequential mirror re-derives the audit from the spec
[Kusupati et al., NeurIPS'22 serving decision]: micro-fp quantization,
exact top-10 per query by FULL-64-d L2 vs by 16-d-PREFIX L2 (both
with vec_id tie-break), and the per-query overlap count.  The Spark
plan computes both ranks from one candidate pass and counts
``r_trunc <= K`` inside the ``r_full <= K`` group — a shape whose
equivalence to "|top-k ∩ top-k|" is exactly the kind of derivation a
shared spec mistake would break identically on both engines; the
mirror computes the literal set intersection instead.  Tiny
coordinate domains force distance ties where the tie-break decides
the overlap.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_FP = 1_000_000
_DIM = 64
_DT = 16
_K = 10
_NQ = 8


def _mirror(vecs):
    """vecs: {vec_id: [64 ints]}.  Returns sorted (query_id, k, n_common)."""

    def d2(a, b, d):
        return sum((a[i] - b[i]) * (a[i] - b[i]) for i in range(d))

    out = []
    for q in sorted(vecs):
        if q >= _NQ:
            continue
        cands = [v for v in vecs if v != q]
        top_full = sorted(cands, key=lambda v: (d2(vecs[q], vecs[v], _DIM), v))[:_K]
        top_trunc = sorted(cands, key=lambda v: (d2(vecs[q], vecs[v], _DT), v))[:_K]
        out.append((q, _K, len(set(top_full) & set(top_trunc))))
    return sorted(out)


@st.composite
def _corpus(draw):
    n = draw(st.integers(2, 30))
    # a few ids below _NQ become queries; the rest sparse above
    n_q = draw(st.integers(1, min(n, _NQ)))
    hi = draw(
        st.lists(st.integers(_NQ, 10_000), min_size=n - n_q, max_size=n - n_q, unique=True)
    )
    ids = list(range(n_q)) + hi
    vecs = {}
    for vid in ids:
        # prefix coordinates from a tiny domain (ties in BOTH rankings);
        # tail coordinates wider so full-d and trunc-d rankings disagree
        pre = [draw(st.integers(0, 2)) * (_FP // 64) for _ in range(_DT)]
        tail = [draw(st.integers(0, 7)) * (_FP // 64) for _ in range(_DIM - _DT)]
        vecs[vid] = pre + tail
    return vecs


@SLOW
@given(_corpus())
def test_q272_matches_spec_mirror(spark, monkeypatch, vecs):
    import lawfirm_data_pipeline_spark.oracle.m83_matryoshka as m

    df = spark.createDataFrame(
        [(vid, [x / _FP for x in fp], 0) for vid, fp in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["query_id"], r["k"], r["n_common"])
        for r in m.q272_matryoshka_audit(spark, "unused").collect()
    )
    assert got == _mirror(vecs)
