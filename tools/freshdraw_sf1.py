#!/usr/bin/env python
"""Fresh-draw corpus for cardinality-sensitive verification
(r9 verdict task #5; seed rotation + second decade r10 verdict #3/#6).

The standing sf1/sf3 replicas (`bench_sf1.materialize`) are ORGANIC
COPIES of sf0.1 — key-shifted x10/x30 — which is exactly right for
exactness/overflow evidence but structurally wrong for operators whose
SEMANTICS are about uniqueness growth: a shifted copy multiplies every
distinct count by exactly the copy factor and preserves each copy's
internal distributions verbatim.  HLL/KMV sketches, heavy hitters,
join-cardinality estimators and capture-recapture would therefore see
an artificial distinct-growth pattern a real 10x corpus never shows.

This tool generates a genuinely FRESH corpus (seeded numpy draws, no
copies): ``factor`` x the entity counts of sf0.1 with the same
schemas, value domains and distribution shapes (profiled from
/root/testdata/sf0.1 — uniform keys, zipf-ish document vocabulary,
5-way categorical event types, TPC-H-like date/price ranges).  It is
an input for the Spark-vs-DuckDB differential on the
distinct/sketch/estimator family — both engines read the SAME parquet,
so the data need not match the driver generator byte-for-byte; it
needs the right CARDINALITY STRUCTURE.

SEED ROTATION (r10 verdict task #3): a fixed-seed corpus is a fixture
after its first green pass — re-running it proves nothing new.  Each
round draws from seed 4242+round into a per-seed directory, and the
seed/factor land in the corpus MANIFEST.json (echoed into the
differential artifact), so the fresh-draw axis stays adversarial.

Usage:
    python tools/freshdraw_sf1.py --round 11              # 10x, seed 4253
    python tools/freshdraw_sf1.py --round 11 --factor 30  # second decade
    python tools/differential_sf1.py \
        --sf-dir benchdata/freshdraw_sf1_s4253 \
        --only q50,q107,q153,q194,q196,q239,q273 \
        --out differential_freshdraw_r11.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"

SEED_BASE = 4242  # round-10's original corpus was exactly seed 4242

DIM = 64

_WORDS = (
    "spark sql query table column row scan sort hash join agg group "
    "filter part order line batch stream value vector fast slow small "
    "large cache disk plan cost stats index page block shuffle skew"
).split()

# part names mirror the driver's STRUCTURE: "adjective noun" over a
# tiny fixed vocabulary (sf0.1 has exactly 64 distinct p_name values).
# Name dictionaries are BLOCKING KEYS for the linkage family
# (q129/q231): their cardinality is a structural property of the
# schema, not a row-count property — the first fresh-draw run used
# 3-word names (39k distinct) and q129's blocked levenshtein ran 25x
# longer against a dictionary the operator contract never promised.
_P_ADJ = "large hot blue old cold small new dark".split()
_P_NOUN = "ring bolt plate wheel cog pin rod cap".split()


def out_dir(
    seed: int, factor: int, skew: float = 0.0, nulls: float = 0.0,
    edge: float = 0.0,
) -> str:
    """Per-seed corpus directory: freshdraw_sf{factor/10}_s{seed}."""
    tag = {10: "sf1", 30: "sf3"}.get(factor, f"x{factor}")
    sk = f"_zipf{skew:g}" if skew else ""
    nu = f"_nulls{nulls:g}" if nulls else ""
    ed = f"_edge{edge:g}" if edge else ""
    return os.path.join(
        _REPO, "benchdata", f"freshdraw_{tag}_s{seed}{sk}{nu}{ed}"
    )


# ---------------------------------------------------------------------------
# EDGE-VALUE injection (r12 axis): the pathological values a real web-
# scale corpus is full of but every prior corpus lacked — empty /
# whitespace-only / emoji / combining-mark / single-char / punctuation-
# only / URL-and-digit / mixed-script / very-long documents, zero and
# extreme-magnitude embedding vectors, exact-duplicate vectors, exact
# timestamp ties, empty-and-null-valued JSON props, and exact range-
# boundary money values.  Injection draws from a SEPARATE rng stream
# (seed + _EDGE_SEED_OFFSET) applied as a post-pass over already-drawn
# columns, so the main key/value draw is bit-identical to the same-seed
# uniform corpus (the pairwise-differ validator exempts same-draw
# siblings by (seed, factor, skew)).
# ---------------------------------------------------------------------------

_EDGE_SEED_OFFSET = 990_000

# document replacement pool: index chosen per edge-selected doc.  Every
# entry is VALID UTF-8 without lone surrogates or NUL bytes (parquet-
# and engine-portable); the adversarial axis is semantic (tokenizers,
# shingles, normalizers, length conventions), not encoding corruption.
_EDGE_DOCS = [
    "",                                          # empty document
    " \t  \n ",                                  # whitespace-only
    "a",                                         # single ASCII char
    "漢",                                    # single CJK char
    "\U0001f680 \U0001f600 data \U0001f525 pipeline \U0001f30d",  # astral emoji
    "café naive résumé café",  # combining accents (NFD-ish)
    "café naïve résumé café",  # precomposed twin
    "!!! ??? ... --- ;;; :::",                   # punctuation-only
    ("spam " * 64).strip(),                      # one token repeated 64x
    "http://example.com/a?b=1&c=2 https://EXAMPLE.com/A 42 3.14159 -7",
    "hello мир 世界 שלום mixed script",
    "line1\nline2\r\nline3\ttabbed",             # embedded newlines/CR/tabs
]

# exact boundary money values (range endpoints + zero + one-cent)
_EDGE_ACCTBAL = np.array([-999.99, 0.0, 9999.99, 0.01, -0.01])
_EDGE_TOTALPRICE = np.array([1000.0, 500000.0, 123456.78])

# exact tie instants inside the events window (microsecond-identical
# timestamps across thousands of rows: window/session tie regime)
_EDGE_TS = [
    np.datetime64("2024-01-08T00:00:00", "us"),
    np.datetime64("2024-01-15T12:00:00", "us"),
    np.datetime64("2024-01-22T06:30:00", "us"),
]

_EDGE_PROPS = ["{}", '{"k": null}']


def _ts_us(base: str, span_days: float, offs: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype("int64")
    us = base_us + (offs * span_days * 86_400e6).astype("int64")
    return pa.array(us, type=pa.timestamp("us"))


def _keydraw(rng, n_keys: int, n_draws: int, skew: float) -> np.ndarray:
    """FK draws: uniform (skew=0) or zipf-ish power-law multiplicities.

    The uniform corpus verifies values under organic UNIQUENESS; the
    skew corpus (r11) verifies the same values — and the join/agg plans
    — under organic HOT KEYS: rank r's draw probability ~ (r+1)^-skew
    via inverse-CDF over the exact normalized tail, so the top key of a
    1.5M-row orders draw at skew 1.2 holds tens of thousands of rows
    (the AQE-skew-join / salting regime the 100 TB posture claims)."""
    if not skew:
        return rng.integers(0, n_keys, n_draws)
    ranks = np.arange(1, n_keys + 1, dtype=np.float64)
    probs = ranks ** -skew
    probs /= probs.sum()
    cdf = np.cumsum(probs)
    idx = np.searchsorted(cdf, rng.uniform(0, 1, n_draws), side="left")
    # hot ranks land on SCATTERED key ids (deterministic permutation), so
    # hotness is not correlated with key locality/partition ranges
    perm = rng.permutation(n_keys)
    return perm[np.clip(idx, 0, n_keys - 1)]


def materialize(
    seed: int = SEED_BASE,
    factor: int = 10,
    out: str | None = None,
    skew: float = 0.0,
    nulls: float = 0.0,
    edge: float = 0.0,
) -> str:
    out = out or out_dir(seed, factor, skew, nulls, edge)
    rng = np.random.default_rng(seed)
    # edge injection uses its OWN stream so the main draw (keys, values,
    # multiplicities) is bit-identical to the same-seed uniform corpus
    erng = np.random.default_rng(seed + _EDGE_SEED_OFFSET)
    os.makedirs(out, exist_ok=True)

    def _edge_vals(arr: np.ndarray, pool: np.ndarray, rate_mult: float = 1.0):
        """Overwrite ~edge*rate_mult of arr with exact boundary values
        (range endpoints, exact zero, one-cent magnitudes): the money
        regime where snap/compare conventions bite."""
        if not edge:
            return arr
        mask = erng.uniform(0, 1, len(arr)) < edge * rate_mult
        arr = arr.copy()
        arr[mask] = pool[erng.integers(0, len(pool), int(mask.sum()))]
        return arr

    def _nullable(arr, rate_mult: float = 1.0):
        """NULL-injection axis (r12): the driver testdata and every
        prior corpus carry ZERO nulls, so the registry's 3VL
        predicates, null group keys, null-skipping aggregates, and
        null ordering had never been exercised by a differential.
        Only measure/attribute columns are nulled — never keys, join
        columns, event timestamps, document text, or embedding
        vectors (those are non-null by the loader contract)."""
        if not nulls:
            return arr
        if not isinstance(arr, pa.Array):
            arr = pa.array(arr)
        import pyarrow.compute as pc

        keep = pa.array(rng.uniform(0, 1, len(arr)) >= nulls * rate_mult)
        return pc.if_else(keep, arr, pa.scalar(None, arr.type))

    f = factor
    n_cust = 15_000 * f
    n_supp = 1_000 * f
    n_part = 20_000 * f
    n_orders = 150_000 * f
    n_line = 600_000 * f
    n_events = 100_000 * f
    n_users = 1_500 * f
    n_docs = 5_000 * f
    n_vecs = 2_000 * f

    rows: dict[str, int] = {}

    def _write(name: str, table: pa.Table) -> None:
        path = os.path.join(out, f"{name}.parquet")
        pq.write_table(table, path)
        rows[name] = table.num_rows
        print(f"  {name}: {table.num_rows} rows -> {path}", flush=True)

    # dimensions: copy verbatim (FK domains must match exactly)
    for t in ("nation", "region"):
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
        rows[t] = pq.read_metadata(os.path.join(out, f"{t}.parquet")).num_rows
        print(f"  {t}: copied", flush=True)

    _write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), type=pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), type=pa.int32()
                ),
                "c_acctbal": _nullable(pa.array(_edge_vals(
                    np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
                    _EDGE_ACCTBAL,
                ))),
                "c_mktsegment": _nullable(pa.array(
                    np.array(
                        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
                    )[rng.integers(0, 5, n_cust)]
                )),
            }
        ),
    )

    _write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), type=pa.int64()),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
                "s_acctbal": _nullable(pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)
                )),
            }
        ),
    )

    _write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), type=pa.int64()),
                "p_name": pa.array(
                    [
                        f"{_P_ADJ[a]} {_P_NOUN[b]}"
                        for a, b in zip(
                            rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
                        )
                    ]
                ),
                "p_brand": pa.array(
                    [f"Brand#{i}" for i in rng.integers(10, 55, n_part)]
                ),
                "p_type": pa.array(
                    np.array(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"])[
                        rng.integers(0, 6, n_part)
                    ]
                ),
                "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
                "p_retailprice": _nullable(pa.array(
                    np.round(rng.uniform(900.0, 2000.0, n_part), 2)
                )),
            }
        ),
    )

    # orders: FRESH uniform custkey draws — a real 10x corpus's
    # per-priority distinct-customer counts follow the birthday
    # saturation curve, not "10x the sf0.1 value" (the copy artifact
    # this corpus exists to remove)
    _write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders), type=pa.int64()),
                "o_custkey": pa.array(
                    _keydraw(rng, n_cust, n_orders, skew), type=pa.int64()
                ),
                "o_orderstatus": pa.array(
                    np.array(["O", "P", "F"])[rng.integers(0, 3, n_orders)]
                ),
                "o_totalprice": _nullable(pa.array(_edge_vals(
                    np.round(rng.uniform(1000.0, 500000.0, n_orders), 2),
                    _EDGE_TOTALPRICE,
                )), 0.5),
                "o_orderdate": _nullable(_ts_us(
                    "1995-01-01", 2400, np.floor(rng.uniform(0, 1, n_orders) * 2400) / 2400
                ), 0.5),
                "o_orderpriority": _nullable(pa.array(
                    np.array(
                        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
                    )[rng.integers(0, 5, n_orders)]
                )),
            }
        ),
    )

    # lineitem: ~4 lines per order via uniform orderkey draws (fresh
    # order-key multiplicities; NOT every orderkey present — organic)
    _write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(
                    _keydraw(rng, n_orders, n_line, skew), type=pa.int64()
                ),
                "l_partkey": pa.array(
                    _keydraw(rng, n_part, n_line, skew), type=pa.int64()
                ),
                "l_suppkey": pa.array(
                    _keydraw(rng, n_supp, n_line, skew), type=pa.int64()
                ),
                "l_linenumber": pa.array(rng.integers(1, 8, n_line), type=pa.int32()),
                "l_quantity": pa.array(
                    rng.integers(1, 51, n_line).astype("float64")
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900.0, 105000.0, n_line), 2)
                ),
                "l_discount": _nullable(pa.array(
                    np.round(rng.integers(0, 11, n_line) / 100.0, 2)
                ), 0.5),
                "l_tax": _nullable(pa.array(np.round(rng.integers(0, 9, n_line) / 100.0, 2)), 0.5),
                "l_returnflag": _nullable(pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, n_line)]
                ), 0.5),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[rng.integers(0, 2, n_line)]
                ),
                "l_shipdate": _nullable(_ts_us(
                    "1995-01-02", 2500, np.floor(rng.uniform(0, 1, n_line) * 2500) / 2500
                ), 0.5),
            }
        ),
    )

    # events: main draw first (stream-identical to the uniform sibling),
    # then the edge post-pass snaps ~edge of timestamps onto three fixed
    # microsecond-identical instants (window/session/rank TIE regime),
    # zeroes half the selected values exactly, and swaps half the
    # selected props for "{}" / '{"k": null}' (missing-key vs JSON-null)
    ev_ts = _ts_us("2024-01-01", 30, rng.uniform(0, 1, n_events))
    ev_user = _keydraw(rng, n_users, n_events, skew)
    ev_type = np.array(["view", "click", "purchase", "signup", "error"])[
        rng.integers(0, 5, n_events)
    ]
    ev_value = np.round(rng.uniform(0, 560.0, n_events), 2)
    ev_props = [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_events)]
    if edge:
        sel = np.flatnonzero(erng.uniform(0, 1, n_events) < edge)
        us = np.asarray(ev_ts.cast(pa.int64())).copy()
        tie = np.array([t.astype("int64") for t in _EDGE_TS])
        us[sel] = tie[erng.integers(0, len(tie), len(sel))]
        ev_ts = pa.array(us, type=pa.timestamp("us"))
        ev_value[sel[erng.uniform(0, 1, len(sel)) < 0.5]] = 0.0
        for i in sel[erng.uniform(0, 1, len(sel)) < 0.5]:
            ev_props[i] = _EDGE_PROPS[erng.integers(0, len(_EDGE_PROPS))]
    _write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_events), type=pa.int64()),
                "ts": ev_ts,
                "user_id": pa.array(ev_user, type=pa.int64()),
                "event_type": pa.array(ev_type),
                "value": _nullable(pa.array(ev_value)),
                "props": _nullable(pa.array(ev_props)),
            }
        ),
    )

    # documents: zipf-ish vocabulary so heavy-hitter thresholds see an
    # organic frequency tail (fresh draws per doc, not repeated texts)
    probs = 1.0 / np.arange(1, len(_WORDS) + 1) ** 1.1
    probs /= probs.sum()
    lengths = rng.integers(10, 60, n_docs)
    texts = [
        " ".join(rng.choice(_WORDS, n, p=probs)) for n in lengths
    ]
    if edge:
        # replace ~edge of documents with pathological texts (empty /
        # whitespace / emoji / combining-mark / repeated-token / URL /
        # mixed-script / embedded-newline / 4000-token long doc) — the
        # "web garbage" every tokenizer/shingler/normalizer meets at
        # crawl scale; n_chars below is computed AFTER replacement
        pool = _EDGE_DOCS + [" ".join(erng.choice(_WORDS, 4000))]
        for i in np.flatnonzero(erng.uniform(0, 1, n_docs) < edge):
            texts[i] = pool[erng.integers(0, len(pool))]
    _write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs), type=pa.int64()),
                "text": pa.array(texts),
                "lang": _nullable(pa.array(
                    np.array(["en", "de", "fr", "es"])[
                        rng.choice(4, n_docs, p=[0.85, 0.05, 0.05, 0.05])
                    ]
                )),
                "source": pa.array(
                    [f"src{s}" for s in rng.integers(0, 20, n_docs)]
                ),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts]), type=pa.int64()
                ),
            }
        ),
    )

    vecs = rng.normal(0, 0.3, (n_vecs, DIM)).astype("float32")
    if edge:
        # ~edge of vectors become pathological: all-zero (norm 0 — the
        # cosine 0/0 guard regime), tiny 1e-20 magnitude (underflow-
        # adjacent norms), huge 1e15 magnitude (float32 dot-product
        # overflow regime), one-hot axis vectors, and EXACT duplicates
        # of another edge vector (cosine==1 ties, exact-dup detection)
        sel = np.flatnonzero(erng.uniform(0, 1, n_vecs) < edge)
        cls = erng.integers(0, 5, len(sel))
        for i, c in zip(sel, cls):
            if c == 0:
                vecs[i] = 0.0
            elif c == 1:
                vecs[i] = 1e-20
            elif c == 2:
                vecs[i] = erng.normal(0, 1e15, DIM).astype("float32")
            elif c == 3:
                vecs[i] = 0.0
                vecs[i, int(erng.integers(0, DIM))] = 1.0
            else:
                vecs[i] = vecs[sel[0]]
    _write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vecs), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
                "label": _nullable(pa.array(rng.integers(0, 8, n_vecs), type=pa.int32())),
            }
        ),
    )

    # MANIFEST records the draw parameters so the differential artifact
    # (which copies it through as `sf_manifest`) proves WHICH corpus the
    # run saw — the rotation is worthless if the artifact can't show it
    with open(os.path.join(out, "MANIFEST.json"), "w") as fh:
        json.dump(
            {"seed": seed, "factor": factor, "skew": skew, "nulls": nulls,
             "edge": edge, "rows": rows},
            fh, indent=1
        )
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--round", type=int, default=None,
        help="round number: seed = 4242 + round (rotating, r10 verdict #3)",
    )
    ap.add_argument(
        "--seed", type=int, default=None,
        help="explicit seed (overrides --round)",
    )
    ap.add_argument(
        "--factor", type=int, default=10, choices=(10, 30),
        help="entity-count multiple over sf0.1 (30 = second decade)",
    )
    ap.add_argument(
        "--skew", type=float, default=0.0,
        help="zipf exponent for FK multiplicities (0 = uniform; 1.2 = "
        "hot-key regime for the skew-join/salting posture)",
    )
    ap.add_argument(
        "--nulls", type=float, default=0.0,
        help="NULL-injection rate for measure/attribute columns (r12 "
        "axis; keys/join columns/text/embeddings stay non-null)",
    )
    ap.add_argument(
        "--edge", type=float, default=0.0,
        help="edge-value injection rate (r12 axis): pathological web-"
        "garbage documents, zero/extreme/duplicate embedding vectors, "
        "exact timestamp ties, empty/null JSON props, boundary money "
        "values — keys and row counts untouched",
    )
    args = ap.parse_args()
    seed = (
        args.seed
        if args.seed is not None
        else SEED_BASE + args.round if args.round is not None else SEED_BASE
    )
    dest = out_dir(seed, args.factor, args.skew, args.nulls, args.edge)
    print(
        f"materializing fresh-draw corpus at {dest} "
        f"(seed {seed}, x{args.factor}, skew {args.skew:g}, "
        f"nulls {args.nulls:g}, edge {args.edge:g})"
    )
    materialize(
        seed, args.factor, skew=args.skew, nulls=args.nulls, edge=args.edge
    )
    print("done")
