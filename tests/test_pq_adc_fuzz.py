"""Spec-level fuzz for q263 (PQ asymmetric-distance top-k, m76).

An independent sequential mirror re-derives the whole search path from
the spec [Jégou et al., PAMI'11 §IV]: micro-fp quantization, codebook
= the 16 smallest-id vectors split into 8 subspaces, code assignment
by squared-L2 argmin with lowest-centroid-id tie-break, per-query
LUTs, ADC = Σ_s LUT_s[code_s], self-exclusion by seed id, and the
(adc, vec_id) top-10.  Both the Arrow kernel and the DuckDB oracle
share one derivation, so the differential cannot catch a shared
mistake in the tie-break or the self-exclusion mapping; this mirror
can.  Coordinates are multiples of 1/64 (micro-fp rounding is exact),
and tiny coordinate domains force frequent assignment ties.
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
_NSUB = 8
_SUBDIM = _DIM // _NSUB
_NC = 16
_NQ = 8
_K = 10


def _mirror(vecs):
    """vecs: {vec_id: [64 ints]} micro-fp.  Returns the sorted
    (query_id, vec_id, adc_micro2, rank) list."""
    ids = sorted(vecs)
    seeds = ids[: max(_NC, _NQ)]
    cb = [
        [vecs[c][s * _SUBDIM : (s + 1) * _SUBDIM] for c in seeds[:_NC]]
        for s in range(_NSUB)
    ]  # [s][centroid_idx][subdim]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    codes = {}
    for vid in ids:
        codes[vid] = [
            min(range(len(cb[s])), key=lambda c: (d2(vecs[vid][s * _SUBDIM : (s + 1) * _SUBDIM], cb[s][c]), c))
            for s in range(_NSUB)
        ]
    out = []
    for q in seeds[:_NQ]:
        lut = [
            [d2(vecs[q][s * _SUBDIM : (s + 1) * _SUBDIM], cb[s][c]) for c in range(len(cb[s]))]
            for s in range(_NSUB)
        ]
        scored = sorted(
            (sum(lut[s][codes[v][s]] for s in range(_NSUB)), v)
            for v in ids
            if v != q
        )
        for rank, (adc, v) in enumerate(scored[:_K], start=1):
            out.append((q, v, adc, rank))
    return sorted(out)


# sparse non-contiguous ids (the r4 posexplode-position bug class) and
# a tiny coordinate domain (multiples of 1/64 -> exact micro-fp; few
# distinct values -> frequent assignment/adc ties)
@st.composite
def _corpus(draw):
    n = draw(st.integers(2, 28))
    ids = draw(
        st.lists(st.integers(0, 10_000), min_size=n, max_size=n, unique=True)
    )
    vecs = {}
    for vid in ids:
        vecs[vid] = [draw(st.integers(0, 3)) * (_FP // 64) for _ in range(_DIM)]
    return vecs


@SLOW
@given(_corpus())
def test_q263_matches_spec_mirror(spark, monkeypatch, vecs):
    import lawfirm_data_pipeline_spark.oracle.m76_pq_adc as m

    df = spark.createDataFrame(
        [(vid, [x / _FP for x in fp], 0) for vid, fp in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = sorted(
        (r["query_id"], r["vec_id"], r["adc_micro2"], r["rank"])
        for r in m.q263_pq_adc_topk(spark, "unused").collect()
    )
    assert got == _mirror(vecs)
