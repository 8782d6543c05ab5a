"""Spec-level fuzz for q279 (greedy WordPiece segmentation, m87).

An independent sequential mirror re-derives greedy longest-match-first
segmentation from the spec: at each position take the LONGEST vocab
entry matching there, advance by its length, count one token; words
are the lowercased whitespace tokens matching ^[a-z]{1,12}$, distinct.
The engine expresses the walk as an unrolled JVM ``aggregate`` fold
over a precomputed (word, pos) → longest-match table and the DuckDB
oracle runs WITH RECURSIVE over the same match table — one shared
derivation, so the 299-query differential cannot catch a shared
mistake in the walk (e.g. longest-match vs first-match, off-by-one in
the position advance, the MAXLEN unroll being too short); this mirror
can (r8 verdict task #3).

The generation alphabet is biased to the vocab's multi-char entries
("the", "ing", "ion", …) so the greedy choice is load-bearing, and
words of length exactly 12 pin the MAXLEN unroll bound (a 12-letter
word of single-letter steps needs all 12 fold iterations).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lawfirm_data_pipeline_spark.oracle.m87_tokenize_bucket_split import (
    _MAXLEN,
    _VOCAB,
)

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_WORD_RE = re.compile(rf"^[a-z]{{1,{_MAXLEN}}}$")


def _mirror(texts: list[str]) -> set[tuple[str, int]]:
    """Greedy longest-match token counts for every distinct valid word."""
    words = {
        w
        for t in texts
        for w in t.lower().split()
        if _WORD_RE.fullmatch(w)
    }
    out = set()
    for w in words:
        p, n = 0, 0
        while p < len(w):
            ml = max(len(v) for v in _VOCAB if w.startswith(v, p))
            p += ml
            n += 1
        out.add((w, n))
    return out


# Vocab-rich letters make multi-char matches frequent; 'z'/'q' rows
# exercise pure single-letter walks; uppercase + digits exercise the
# lowercasing and the valid-word filter.
_LETTERS = "theandingionster"


@st.composite
def _texts(draw):
    n_docs = draw(st.integers(1, 6))
    texts = []
    for _ in range(n_docs):
        n_words = draw(st.integers(0, 8))
        words = []
        for _ in range(n_words):
            kind = draw(st.integers(0, 9))
            if kind == 0:
                words.append(draw(st.text(alphabet="zq", min_size=_MAXLEN, max_size=_MAXLEN)))
            elif kind == 1:
                words.append("THE" + draw(st.text(alphabet=_LETTERS, max_size=4)))
            elif kind == 2:
                words.append("x9" + draw(st.text(alphabet=_LETTERS, max_size=3)))
            elif kind == 3:
                words.append(draw(st.text(alphabet=_LETTERS, min_size=13, max_size=15)))
            else:
                words.append(
                    draw(st.text(alphabet=_LETTERS, min_size=1, max_size=_MAXLEN))
                )
        texts.append("  ".join(words))
    return texts


@SLOW
@given(_texts())
def test_q279_matches_spec_mirror(spark, monkeypatch, texts):
    import lawfirm_data_pipeline_spark.oracle.m87_tokenize_bucket_split as m

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        (r["word"], r["n_tokens"])
        for r in m.q279_greedy_wordpiece(spark, "unused").collect()
    }
    assert got == _mirror(texts)


def test_q279_greedy_prefers_longest_not_first(spark, monkeypatch):
    """'the' must segment as ['the'] (1 token), never ['th','e'] or
    ['t','he'] — the exact divergence a first-match or shortest-match
    bug would produce."""
    import lawfirm_data_pipeline_spark.oracle.m87_tokenize_bucket_split as m

    df = spark.createDataFrame(
        [(0, "the thee theing zzzzzzzzzzzz")], "doc_id long, text string"
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        (r["word"], r["n_tokens"])
        for r in m.q279_greedy_wordpiece(spark, "unused").collect()
    }
    # thee = the + e; theing = the + ing; 12 z's = 12 singles
    assert got == {("the", 1), ("thee", 2), ("theing", 2), ("zzzzzzzzzzzz", 12)}
