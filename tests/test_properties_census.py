"""Hypothesis invariants for the round-6 census-reshaped operators.

* prefix-filter COMPLETENESS: `prefix_filter_jaccard_pairs` must find
  EXACTLY the pairs a brute-force shingle-set Jaccard finds, on
  arbitrary token soups — this exercises the integer-ceil prefix-length
  math (a float ceil would silently shrink recall) and, post-census,
  the pinned prefix table;
* token-drift KL: non-negative on arbitrary corpora (Gibbs), exactly
  zero when the two populations carry identical text multisets —
  exercises the pinned counts/merged tables end to end.

Few, small examples — boundary shapes (docs shorter than the shingle
width, all-identical docs, single-source corpora), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lawfirm_data_pipeline_spark.operators.curation import token_drift_kl
from lawfirm_data_pipeline_spark.operators.dedup import prefix_filter_jaccard_pairs

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


def _shingles(text: str, n: int = 3) -> frozenset[str]:
    toks = [t for t in text.lower().split() if t]
    if len(toks) < n:
        return frozenset()
    return frozenset(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


@SLOW
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
def test_prefix_filter_equals_bruteforce(spark, docs):
    num, den = 1, 2  # tau = 0.5 — low enough that pairs actually occur
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["ida"], r["idb"])
        for r in prefix_filter_jaccard_pairs(
            df, threshold_num=num, threshold_den=den
        ).collect()
    }
    sh = {i: _shingles(t) for i, t in enumerate(docs)}
    want = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            common = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            # the operator's gate is den*common >= num*union over docs
            # that HAVE shingles on both sides (empty sets never index)
            if sh[a] and sh[b] and den * common >= num * union:
                want.add((a, b))
    assert got == want


@SLOW
@given(
    texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_token_drift_kl_zero_on_identical_populations(spark, texts):
    # even/odd doc ids carry the SAME text multiset -> both populations
    # have identical token distributions -> KL must be exactly 0
    rows = []
    for i, t in enumerate(texts):
        rows.append((2 * i, "s", t))
        rows.append((2 * i + 1, "s", t))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_drift_kl(df).collect()
    assert len(out) == 1 and out[0]["kl"] == 0.0


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6).map(" ".join),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_token_drift_kl_nonnegative(spark, rows):
    # KL between two add-one-smoothed distributions over the merged
    # per-source vocabulary is >= 0 (Gibbs); the fixed-point snap can
    # dent that by at most one pico-unit per term
    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)],
        "doc_id long, source string, text string",
    )
    for r in token_drift_kl(df).collect():
        assert r["kl"] >= -1e-6, r


@SLOW
@given(
    toks=st.lists(st.sampled_from(_WORDS), min_size=0, max_size=40),
    size=st.integers(2, 12),
    overlap_frac=st.floats(0, 0.9),
)
def test_chunk_tokens_covers_exactly_with_stated_overlap(spark, toks, size, overlap_frac):
    """Chunking invariants vs a sequential mirror on arbitrary
    (size, overlap) shapes: chunk i starts at i*stride; every token
    appears; concatenating chunks with the first `overlap` tokens
    dropped from chunks 1.. reconstructs the document exactly."""
    from lawfirm_data_pipeline_spark.operators.text import chunk_tokens

    overlap = min(int(size * overlap_frac), size - 1)
    stride = size - overlap
    text = " ".join(toks)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = df.select(chunk_tokens("text", size=size, overlap=overlap).alias("c"))
    chunks = [
        (c["chunk_idx"], c["chunk"].split(" ") if c["chunk"] else [])
        for c in out.first()["c"]
    ]
    if not toks:
        assert chunks == []
        return
    assert [i for i, _ in chunks] == list(range(len(chunks)))
    for i, body in chunks:
        assert body == toks[i * stride : i * stride + size], (i, size, overlap)
    rebuilt = list(chunks[0][1])
    for _, body in chunks[1:]:
        rebuilt.extend(body[overlap:])
    assert rebuilt == toks, (size, overlap)
    # no chunk is pure overlap of the previous one (progress guaranteed)
    assert all(len(b) > 0 for _, b in chunks)


@SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=25,
    ),
    chain=st.integers(0, 60),
)
def test_connected_components_equals_union_find(spark, edges, chain):
    """CC vs a union-find mirror on random edge lists PLUS an attached
    long path (the adversarial diameter case: one-hop-per-round
    propagation silently mislabeled any path longer than max_iters
    before the round-6 pointer-jump fix)."""
    from lawfirm_data_pipeline_spark.operators.graph import connected_components

    all_edges = list(edges) + [(100 + i, 100 + i + 1) for i in range(chain)]
    if not all_edges:
        return
    df = spark.createDataFrame(all_edges, "ida long, idb long")
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in all_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in parent}
    assert got == want


@SLOW
@given(
    keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    epoch=st.integers(0, 5),
    n_shards=st.sampled_from([1, 3, 8]),
)
def test_epoch_shuffle_is_partition_stable_permutation(spark, keys, epoch, n_shards):
    """(shard, pos) must be a bijection onto the input keys — no row
    lost or duplicated, positions dense 1..|shard| within each shard —
    and identical under a different partitioning (the training-order
    reproducibility the operator exists for)."""
    from lawfirm_data_pipeline_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    out = epoch_shuffle(df, epoch=epoch, n_shards=n_shards).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(keys)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    again = epoch_shuffle(
        df.repartition(7), epoch=epoch, n_shards=n_shards
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
