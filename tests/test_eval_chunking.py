"""Property tests for the m35 wave: the CDC chunker's edit-stability
(its reason to exist) and recommender-eval bounds."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _cuts(text: str) -> set[int]:
    return {
        i
        for i in range(4, len(text) + 1)
        if int(hashlib.md5(text[i - 4 : i].encode()).hexdigest()[:8], 16) % 64 == 0
    }


def test_cdc_boundaries_survive_a_local_edit():
    # pure-python mirror of the boundary rule: a one-char edit moves
    # only boundaries whose 4-gram window covers the edit site
    base = "the quick brown fox jumps over the lazy dog " * 30
    edited = base[:500] + "X" + base[501:]
    a, b = _cuts(base), _cuts(edited)
    # boundaries outside the 4-char blast radius are identical
    stable = {i for i in a if i < 498 or i > 504}
    assert stable == {i for i in b if i < 498 or i > 504}
    # fixed-width chunking would shift EVERY boundary after the edit if
    # the edit changed length; CDC keeps the tail aligned by content


def test_cdc_chunking_query_matches_python_mirror(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m35_eval_chunking as m

    texts = [(i, ("lorem ipsum dolor sit amet " * (i + 2))[: 50 + 17 * i]) for i in range(6)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {r["doc_id"]: r["n_chunks"] for r in m.q166_cdc_chunking(spark, "unused").collect()}
    want = {i: len(_cuts(t)) + 1 for i, t in texts}
    assert got == want


def test_rec_precision_bounds(spark):
    import lawfirm_data_pipeline_spark.oracle.m35_eval_chunking as m

    r = m.q164_rec_precision(spark, "/root/testdata/sf0.001").collect()[0]
    assert 0.0 <= r["precision_at_3"] <= 1.0
    assert r["n_hits"] <= r["n_recommended"]
    assert r["n_recommended"] <= 3 * r["n_parts_scored"]
