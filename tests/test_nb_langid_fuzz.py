"""Spec-level fuzz for q293 (train-and-apply multinomial naive Bayes
language ID, m94).

An independent Python mirror re-derives the whole classifier from the
spec: per-(lang, token) counts from the corpus's own labels, add-one
smoothing over the GLOBAL vocabulary, nano-fixed-point log likelihood
round(ln((c+1)/(n_lang+|V|))·1e9) snapped BEFORE the per-doc integer
sum, per-doc score for EVERY language = Σ over token occurrences
(multiplicity counts), argmax with the (score DESC, lang ASC)
tie-break, confusion matrix of (true, pred) counts.  The Spark plan
and the DuckDB oracle share one derivation, so the differential cannot
catch a shared mistake in the smoothing denominator, the
occurrence-multiplicity sum, or the argmax tie-break; this mirror can
(r8 verdict task #3).

Tiny token alphabets force heavy cross-language token sharing (ties
and near-ties); token-free docs must vanish from the matrix; rounding
mirrors half-away-from-zero (Spark/DuckDB ROUND on negatives), never
Python banker's.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _half_away(x: float) -> int:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _mirror(rows: list[tuple[int, str, str]]):
    toks = [
        (doc_id, lang, tok)
        for doc_id, lang, text in rows
        for tok in text.lower().split()
    ]
    counts: Counter = Counter()
    for _d, lang, tok in toks:
        counts[(lang, tok)] += 1
    vocab = {tok for _l, tok in counts}
    v = len(vocab)
    n_lang: Counter = Counter()
    for (lang, _t), c in counts.items():
        n_lang[lang] += c
    nano = {
        (lang, tok): _half_away(
            math.log((counts.get((lang, tok), 0) + 1) / (n + v)) * 1e9
        )
        for lang, n in n_lang.items()
        for tok in vocab
    }
    doc_toks: dict[int, list[str]] = defaultdict(list)
    true_lang: dict[int, str] = {}
    for doc_id, lang, tok in toks:
        doc_toks[doc_id].append(tok)
        true_lang[doc_id] = lang
    matrix: Counter = Counter()
    for doc_id, ts in doc_toks.items():
        scores = {
            cand: sum(nano[(cand, t)] for t in ts) for cand in n_lang
        }
        pred = min(scores, key=lambda c: (-scores[c], c))
        matrix[(true_lang[doc_id], pred)] += 1
    return dict(matrix)


_TOKS = ["aa", "ab", "ba", "bb", "cc"]
_LANGS = ["de", "en", "fr"]


@st.composite
def _docs(draw):
    n = draw(st.integers(2, 12))
    ids = draw(st.lists(st.integers(0, 500), min_size=n, max_size=n, unique=True))
    rows = []
    for doc_id in ids:
        lang = draw(st.sampled_from(_LANGS))
        n_toks = draw(st.integers(0, 6))  # 0 -> token-free doc, must vanish
        text = " ".join(draw(st.sampled_from(_TOKS)) for _ in range(n_toks))
        rows.append((doc_id, lang, text))
    return rows


@SLOW
@given(_docs())
def test_q293_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m94_nb_auc as m

    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        (r["true_lang"], r["pred_lang"]): r["n"]
        for r in m.q293_naive_bayes_langid(spark, "unused").collect()
    }
    assert got == _mirror(rows)


def test_q293_tied_scores_break_to_lexicographically_first_lang(
    spark, monkeypatch
):
    """Two languages with IDENTICAL training counts score every doc
    identically — the argmax must resolve to the lexicographically
    smaller language name on BOTH docs (row_number ORDER BY s DESC,
    cand ASC), the exact divergence a max_by/first-wins implementation
    would produce."""
    import lawfirm_data_pipeline_spark.oracle.m94_nb_auc as m

    rows = [(1, "en", "aa bb"), (2, "de", "aa bb")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        (r["true_lang"], r["pred_lang"]): r["n"]
        for r in m.q293_naive_bayes_langid(spark, "unused").collect()
    }
    assert got == {("en", "de"): 1, ("de", "de"): 1}
