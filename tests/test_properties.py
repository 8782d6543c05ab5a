"""Property-based invariants (SURVEY.md §5.4, hypothesis):

* upsert is idempotent: applying the same incoming batch twice equals
  applying it once;
* dedup_insert with a tiebreak is permutation-stable: input row order
  never changes the outcome (parallel batches have no arrival order);
* relation ``some``/``none`` partition the parent set exactly;
* connect_or_create is idempotent on dim + bridge.

Spark jobs are slow per example, so examples are few and small — the
value is in the adversarial shapes hypothesis finds (dup keys inside one
batch, empty sides, all-dup batches), not in volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lawfirm_data_pipeline_spark.operators.mutations import (
    connect_or_create,
    dedup_insert,
    upsert,
)
from lawfirm_data_pipeline_spark.operators.relations import relation_none, relation_some

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.text(alphabet="abc", min_size=0, max_size=3)

ROWS = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=12)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def df_of(spark, rows, schema="k int, v string"):
    return spark.createDataFrame([tuple(r) for r in rows], schema)


def canon(df):
    return sorted(repr(tuple(r)) for r in df.collect())


@SLOW
@given(base=ROWS, inc=ROWS)
def test_upsert_idempotent(spark, base, inc):
    b = df_of(spark, [(k, v) for k, v in {r[0]: r for r in base}.values()])
    i = df_of(spark, [(k, v) for k, v in {r[0]: r for r in inc}.values()])
    once = upsert(b, i, keys="k")
    twice = upsert(once, i, keys="k")
    assert canon(once) == canon(twice)


@SLOW
@given(existing=ROWS, new=ROWS, seed=st.randoms())
def test_dedup_insert_permutation_stable(spark, existing, new, seed):
    ex = df_of(spark, [(k, v) for k, v in {r[0]: r for r in existing}.values()])
    shuffled = list(new)
    seed.shuffle(shuffled)
    a = dedup_insert(ex, df_of(spark, new), unique_key="k", tiebreak=["v"])
    b = dedup_insert(ex, df_of(spark, shuffled), unique_key="k", tiebreak=["v"])
    assert canon(a) == canon(b)


@SLOW
@given(parents=st.lists(KEYS, min_size=0, max_size=8, unique=True), children=ROWS)
def test_some_none_partition_parent(spark, parents, children):
    p = spark.createDataFrame([(k,) for k in parents], "pk int")
    c = df_of(spark, children, "fk int, v string")
    some = relation_some(p, c, "pk", "fk")
    none = relation_none(p, c, "pk", "fk")
    got = sorted([r.pk for r in some.collect()] + [r.pk for r in none.collect()])
    assert got == sorted(parents)  # disjoint, exhaustive


@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["spark", "scan", "join", "filler", "row"]),
                 min_size=1, max_size=8),
        min_size=1, max_size=8,
    )
)
def test_bm25_matches_reference_implementation(spark, docs):
    """Spark BM25 == a direct textbook Python implementation on the same
    corpus (fixed-point rounding applied identically)."""
    import math

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    from lawfirm_data_pipeline_spark.operators.retrieval import bm25_scores

    got = {r.doc_id: r.score for r in bm25_scores(df, ["spark", "join"]).collect()}

    k1, b = 1.2, 0.75
    n = len(docs)
    avgdl = sum(len(ws) for ws in docs) / n
    want = {}
    for term in ("spark", "join"):
        dfreq = sum(1 for ws in docs if term in ws)
        if dfreq == 0:
            continue
        idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
        for i, ws in enumerate(docs):
            tf = ws.count(term)
            if tf == 0:
                continue
            s = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
            want[i] = want.get(i, 0) + int(round(s * 1e9))
    want = {i: round(v / 1e9, 6) for i, v in want.items()}
    assert got == want


@SLOW
@given(rows=st.lists(st.tuples(KEYS, st.sampled_from(["t1", "t2"]), st.integers(0, 9)),
                     min_size=1, max_size=12))
def test_keep_best_winner_dominates_group(spark, rows):
    uniq = {r[0]: r for r in rows}.values()
    df = spark.createDataFrame(list(uniq), "doc_id int, text string, q int")
    from lawfirm_data_pipeline_spark.operators.dedup import keep_best_in_group

    best = keep_best_in_group(df, quality=F.col("q")).collect()
    by_text: dict[str, list] = {}
    for d, t, q in uniq:
        by_text.setdefault(t, []).append((q, d))
    assert len(best) == len(by_text)
    # winner = max quality, ties -> min id
    want = {t: (max(g)[0], min(d for q, d in g if q == max(g)[0]))
            for t, g in by_text.items()}
    got = {(r.best_quality, r.best_id) for r in best}
    assert got == {(q, d) for q, d in want.values()}


@SLOW
@given(hist=st.lists(st.sampled_from(["a", "b", "c"]), max_size=6),
       batch=st.lists(st.tuples(st.integers(0, 20), st.sampled_from(["a", "b", "c", "d"])),
                      min_size=0, max_size=10))
def test_incremental_dedup_invariants(spark, hist, batch):
    batch = list({r[0]: r for r in batch}.values())
    h = spark.createDataFrame([(i, t) for i, t in enumerate(hist)] or [], "doc_id int, text string")
    nb = spark.createDataFrame(batch or [], "doc_id int, text string")
    from lawfirm_data_pipeline_spark.operators.dedup import incremental_exact_dedup

    kept = incremental_exact_dedup(nb, h).collect()
    kept_ids = {r.doc_id for r in kept}
    kept_txt = [r.text for r in kept]
    assert kept_ids <= {i for i, _ in batch}  # subset of the batch
    assert not (set(kept_txt) & set(hist))  # nothing already in history
    assert len(kept_txt) == len(set(kept_txt))  # batch-internal dedup
    # completeness: every novel text survives exactly once via its min id
    novel = {t for _, t in batch} - set(hist)
    assert set(kept_txt) == novel
    for t in novel:
        assert min(i for i, bt in batch if bt == t) in kept_ids


@SLOW
@given(tags=st.lists(st.tuples(KEYS, st.sampled_from(["x", "y", "z"])), max_size=10))
def test_connect_or_create_idempotent(spark, tags):
    by_fact: dict[int, list[str]] = {}
    for fid, name in tags:
        by_fact.setdefault(fid, []).append(name)
    facts = spark.createDataFrame(
        [(str(fid), names) for fid, names in by_fact.items()] or [],
        "id string, tags array<string>",
    )
    dim = spark.createDataFrame([("d0", "x")], "id string, name string")
    bridge = spark.createDataFrame([], "A string, B string")
    d1, b1 = connect_or_create(facts, dim, bridge)
    d2, b2 = connect_or_create(facts, d1, b1)
    assert canon(d1.select("name")) == canon(d2.select("name"))
    assert b1.count() == b2.count()
    # dim keys stay unique
    assert d1.count() == d1.select("name").distinct().count()


# --- round-3 wave invariants ------------------------------------------

TOKENS = st.sampled_from(["a", "b", "c", "d", "hot"])
DOC_TEXTS = st.lists(
    st.lists(TOKENS, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@SLOW
@given(texts=DOC_TEXTS, phi=st.sampled_from([0.05, 0.1, 0.2]))
def test_heavy_hitters_equals_exact_filter(spark, texts, phi):
    """MG candidates + recount == plain exact count filter, for any
    stream and threshold — the sketch may only prune, never distort."""
    import math

    from lawfirm_data_pipeline_spark.operators.sketch import heavy_hitters

    docs = df_of(spark, list(enumerate(texts)), "doc_id int, text string")
    got = {(r.token, r.cnt) for r in heavy_hitters(docs, phi=phi).collect()}
    toks = [t for x in texts for t in x.split()]
    if not toks:
        assert got == set()
        return
    thresh = math.ceil(phi * len(toks))
    want = {
        (w, toks.count(w))
        for w in set(toks)
        if toks.count(w) >= thresh
    }
    assert got == want


@SLOW
@given(texts=DOC_TEXTS)
def test_cms_never_undercounts(spark, texts):
    from lawfirm_data_pipeline_spark.operators.sketch import cms_frequency_audit

    docs = df_of(spark, list(enumerate(texts)), "doc_id int, text string")
    rows = cms_frequency_audit(docs, depth=2, width=16).collect()
    assert all(r.within_lower for r in rows)


@SLOW
@given(
    weights=st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=20),
    k=st.integers(min_value=1, max_value=5),
)
def test_weighted_reservoir_is_subset_invariant(spark, weights, k):
    """Exact-k output (or all rows when k >= n), stable under
    repartitioning, and a pure function of keys+weights."""
    from lawfirm_data_pipeline_spark.operators.sampling import weighted_reservoir_sample

    rows = [(i, float(w)) for i, w in enumerate(weights)]
    df = df_of(spark, rows, "id int, w double")
    a = [r.id for r in weighted_reservoir_sample(df, k, "id", "w").collect()]
    b = [r.id for r in weighted_reservoir_sample(df.repartition(5), k, "id", "w").collect()]
    assert a == b
    assert len(a) == min(k, len(rows))


@SLOW
@given(texts=st.lists(st.lists(TOKENS, min_size=5, max_size=10).map(" ".join), min_size=2, max_size=6))
def test_containment_self_and_bounds(spark, texts):
    """Containment values lie in (0, 1]; a doc never pairs with itself."""
    from lawfirm_data_pipeline_spark.operators.dedup import containment_pairs

    docs = df_of(spark, list(enumerate(texts)), "doc_id int, text string")
    rows = containment_pairs(docs, threshold=0.0, n=2, min_shingles=1).collect()
    for r in rows:
        assert r.ida != r.idb
        assert 0.0 < r.containment <= 1.0


@SLOW
@given(
    steps=st.lists(st.sampled_from(["view", "click", "purchase"]), min_size=1, max_size=6),
    n_users=st.integers(min_value=1, max_value=5),
)
def test_funnel_counts_are_monotone(spark, steps, n_users):
    """Each funnel step's user count never exceeds the previous step's,
    for ANY event soup (strict sequencing can only lose users)."""
    import datetime

    from lawfirm_data_pipeline_spark.operators.behavior import funnel_steps

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for u in range(n_users):
        for i, s in enumerate(steps):
            rows.append((u, base + datetime.timedelta(hours=(u * 31 + i * 7) % 50), s))
    df = df_of(spark, rows, "user_id int, ts timestamp, event_type string")
    out = sorted(
        (r.step_idx, r.n_users)
        for r in funnel_steps(df, ["view", "click", "purchase"]).collect()
    )
    counts = [n for _, n in out]
    assert counts == sorted(counts, reverse=True)
