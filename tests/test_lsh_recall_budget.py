"""Recall-budget regression for lsh_neardup_pairs (r9, sf1 finding).

The sf1 value differential caught the former 8-table default missing a
planted pair (cos 0.981) out of ~1000 — per-pair miss 0.40^8 ≈ 6.7e-4,
i.e. ~0.7 EXPECTED misses per sf1 corpus.  This test rebuilds that
regime synthetically: ~5000 planted near-parallel pairs (θ ≈ 0.2 rad)
in a 15k-vector corpus, where 8 tables expect ~3.4 misses (P[all
found] ≈ 3%) and the 16-table default expects ~2e-3 (P[all found] ≈
99.8%) — and the planes are deterministic, so for THIS corpus the
outcome is exact, not probabilistic.  The ground truth is a NumPy
brute-force cosine over the full corpus, so the assert is full
set-equality of pairs above threshold, not just planted-pair recall.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

_DIM = 64
_N_BASE = 10_000
_N_PLANT = 5_000
_THRESHOLD = 0.95


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(20260815)
    base = rng.standard_normal((_N_BASE, _DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # planted copies: rotate each of the first _N_PLANT vectors by
    # ~0.2 rad toward an orthogonal direction -> cos ≈ 0.980
    theta = 0.2
    ortho = rng.standard_normal((_N_PLANT, _DIM))
    ortho -= (np.sum(ortho * base[:_N_PLANT], axis=1, keepdims=True)) * base[:_N_PLANT]
    ortho /= np.linalg.norm(ortho, axis=1, keepdims=True)
    plant = np.cos(theta) * base[:_N_PLANT] + np.sin(theta) * ortho
    vecs = np.vstack([base, plant])
    ids = np.arange(len(vecs))
    return ids, vecs


def _brute_pairs(ids, vecs):
    sims = vecs @ vecs.T
    norms = np.linalg.norm(vecs, axis=1)
    sims /= np.outer(norms, norms)
    ia, ib = np.where(np.triu(sims >= _THRESHOLD, k=1))
    return {(int(ids[a]), int(ids[b])) for a, b in zip(ia, ib)}


def test_default_tables_find_every_pair_at_sf1_scale(spark, corpus):
    from lawfirm_data_pipeline_spark.operators.similarity import lsh_neardup_pairs

    ids, vecs = corpus
    truth = _brute_pairs(ids, vecs)
    # sanity: the plant produced a pair population in the found regime
    assert len(truth) >= _N_PLANT

    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    got = {
        (r["ida"], r["idb"])
        for r in lsh_neardup_pairs(df, threshold=_THRESHOLD).collect()
    }
    missed = truth - got
    spurious = got - truth
    assert not spurious, f"pairs below threshold emitted: {sorted(spurious)[:5]}"
    assert not missed, (
        f"{len(missed)} of {len(truth)} near-dup pairs missed at the "
        f"default table count — recall budget regressed: {sorted(missed)[:5]}"
    )
