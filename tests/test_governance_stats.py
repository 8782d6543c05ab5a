"""Property tests for the m43 wave: source-overlap mask expansion,
k-NN label-noise planting, WOE identities, jackknife vs sequential."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_source_overlap_mask_equals_naive(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m43_governance_stats as m

    shared = "common run of tokens here okay"
    rows = [
        (0, "src0", f"{shared} alpha beta gamma"),
        (1, "src1", f"{shared} delta epsilon zeta"),
        (2, "src2", "totally disjoint text with other words"),
        (3, "src0", "more src0 only content words here"),
    ]
    df = _docs(spark, rows)
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in m.q185_source_overlap(spark, "unused").collect()
    }
    # naive reference: distinct 3-gram shingle sets per source
    import itertools

    def sh(text):
        toks = text.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    by_src: dict[str, set] = {}
    for _, src, text in rows:
        by_src.setdefault(src, set()).update(sh(text))
    want = {}
    for a, b in itertools.combinations(sorted(by_src, key=lambda s: int(s[3:])), 2):
        n = len(by_src[a] & by_src[b])
        if n:
            want[(a, b)] = n
    assert got == want


def test_knn_flags_planted_mislabel(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m43_governance_stats as m

    # two tight clusters far apart; vec 0 sits in cluster B but carries
    # cluster A's label -> its 5 neighbors all disagree
    rows = []
    for i in range(30):
        base = [0.0] * 8
        base[0] = 10.0 + (i % 7) * 0.01
        rows.append((i + 1, [float(x) for x in base], 1))
    for i in range(30):
        base = [0.0] * 8
        base[1] = 10.0 + (i % 7) * 0.01
        rows.append((i + 31, [float(x) for x in base], 2))
    bad = [0.0] * 8
    bad[1] = 10.0
    rows.append((0, [float(x) for x in bad], 1))  # mislabeled
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    out = {r["vec_id"]: r for r in m.q186_knn_label_noise(spark, "unused").collect()}
    assert out[0]["suspicious"] and out[0]["n_agree"] == 0
    ok = [r for v, r in out.items() if v != 0]
    assert ok and all(not r["suspicious"] for r in ok)


def test_woe_bins_partition_and_iv_sign(spark):
    import lawfirm_data_pipeline_spark.oracle.m43_governance_stats as m

    out = m.q187_woe_binning(spark, SF).collect()
    assert len(out) == 10
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    assert sum(r["n"] for r in out) == orders.count()
    assert all(r["iv_term"] >= 0 for r in out)  # each IV term is (p-q)ln(p/q) >= 0
    # WOE must average ~0 under event weighting minus nonevent weighting
    te = sum(r["n_event"] for r in out)
    tn = sum(r["n"] - r["n_event"] for r in out)
    resid = sum(
        (r["n_event"] / te - (r["n"] - r["n_event"]) / tn) for r in out
    )
    assert abs(resid) < 1e-9  # shares each sum to 1


def test_jackknife_matches_sequential(spark, monkeypatch):
    import lawfirm_data_pipeline_spark.oracle.m43_governance_stats as m

    df = spark.read.parquet(f"{SF}/orders.parquet")
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    r = m.q188_jackknife_ci(spark, "unused").collect()[0]
    # sequential mirror with the same md5 strata + micro-fp snapping
    import hashlib

    strata: dict[int, list[int]] = {}
    for row in df.select("o_orderkey", "o_totalprice").collect():
        s = int(hashlib.md5(f"jk:{row['o_orderkey']}".encode()).hexdigest()[:8], 16) % 10
        strata.setdefault(s, []).append(round(row["o_totalprice"] * 100))
    sums = {s: sum(v) for s, v in strata.items()}
    ns = {s: len(v) for s, v in strata.items()}
    S, N, g = sum(sums.values()), sum(ns.values()), len(strata)
    m_fp = [round((S - sums[s]) / (N - ns[s]) * 1e6) for s in strata]
    sm, sm2 = sum(m_fp), sum(x * x for x in m_fp)
    se = math.sqrt((g - 1) / g * (g * sm2 - sm * sm) / (g * g)) / 1e6
    assert r["n_orders"] == N
    assert abs(r["mean_cents"] - round(S / N, 2)) < 1e-9
    assert abs(r["jk_se_cents"] - round(se, 2)) < 1e-9
