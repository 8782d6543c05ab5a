"""Spec-level fuzz for q248 (BPE encode via marker rewrites, m69).

An independent Python mirror re-derives the encode from the spec:
normalize = lowercase + whitespace-tokenize + single-space join, apply
the 4-entry merge list IN ORDER as literal leftmost non-overlapping
replaces (Python ``str.replace`` — a third implementation of the same
contract as Spark's ``F.replace`` and DuckDB's ``replace``), then
n_char_tokens = len(norm) − (n_words − 1) and n_bpe_tokens likewise on
the merged string.  Both engines share the marker-char derivation, so
the differential cannot catch a shared mistake in the merge ORDER
(merge 2 consumes merge 1's marker: "\\x01e" only exists after "th"
ran) or the space-discount arithmetic; this mirror can (r8 verdict
task #3).

Texts are biased to overlapping merge material ("ththe", "anin",
"thethe") so non-overlapping scan order and the marker cascade are
load-bearing; odd doc_ids pin the %2 source filter.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lawfirm_data_pipeline_spark.oracle.m69_bpe_shards import _MERGES

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _mirror(rows: list[tuple[int, str]]):
    out = {}
    for doc_id, text in rows:
        if doc_id % 2 != 0:
            continue
        words = text.lower().split()
        norm = " ".join(words)
        merged = norm
        for pat, rep in _MERGES:
            merged = merged.replace(pat, rep)
        n_words = len(words)
        n_char = len(norm) - (n_words - 1)
        n_bpe = len(merged) - (n_words - 1)
        out[doc_id] = (n_words, n_char, n_bpe, n_bpe / n_char)
    return out


_CHUNKS = ["th", "the", "an", "in", "ine", "tha", "nth", "e", "a", "n", "i",
           "x", "ththe", "anin", "thethe", "thein"]


@st.composite
def _docs(draw):
    n = draw(st.integers(1, 8))
    ids = draw(st.lists(st.integers(0, 1000), min_size=n, max_size=n, unique=True))
    rows = []
    for doc_id in ids:
        n_words = draw(st.integers(1, 6))
        words = [
            "".join(draw(st.lists(st.sampled_from(_CHUNKS), min_size=1, max_size=4)))
            for _ in range(n_words)
        ]
        if draw(st.booleans()):
            words[0] = words[0].upper()
        sep = "  " if draw(st.booleans()) else " "
        rows.append((doc_id, sep.join(words)))
    return rows


@SLOW
@given(_docs())
def test_q248_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m69_bpe_shards as m

    df = spark.createDataFrame(rows, "doc_id long, text string")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    exp = _mirror(rows)
    got = m.q248_bpe_encode(spark, "unused").collect()
    assert {r["doc_id"] for r in got} == set(exp)
    for r in got:
        n_words, n_char, n_bpe, comp = exp[r["doc_id"]]
        assert (r["n_words"], r["n_char_tokens"], r["n_bpe_tokens"]) == (
            n_words,
            n_char,
            n_bpe,
        ), r["doc_id"]
        # query rounds compression to 6; compare at the half-ulp
        assert abs(r["compression"] - comp) <= 5.0000001e-7, r["doc_id"]


def test_q248_merge_order_cascades(spark, monkeypatch):
    """'the' must encode to ONE token: merge 1 rewrites 'th'→\\x01,
    merge 2 rewrites '\\x01e'→\\x02 — an implementation that applies
    merges against the ORIGINAL string (not the running rewrite)
    leaves 2 tokens and fails here."""
    import lawfirm_data_pipeline_spark.oracle.m69_bpe_shards as m

    df = spark.createDataFrame(
        [(0, "the"), (2, "ththe"), (4, "anan")], "doc_id long, text string"
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        r["doc_id"]: (r["n_char_tokens"], r["n_bpe_tokens"])
        for r in m.q248_bpe_encode(spark, "unused").collect()
    }
    # the -> \x02 (1); ththe -> \x01 + \x02 (2: 'th'+'the', left-to-right
    # non-overlapping 'th' matches at 0 and 2, leaving trailing 'e' to
    # pair with the SECOND marker); anan -> \x03\x03 (2)
    assert got == {0: (3, 1), 2: (5, 2), 4: (4, 2)}
