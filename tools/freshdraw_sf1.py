#!/usr/bin/env python
"""Fresh-draw sf1-scale corpus for cardinality-sensitive verification
(r9 verdict task #5).

The standing sf1/sf3 replicas (`bench_sf1.materialize`) are ORGANIC
COPIES of sf0.1 — key-shifted x10/x30 — which is exactly right for
exactness/overflow evidence but structurally wrong for operators whose
SEMANTICS are about uniqueness growth: a shifted copy multiplies every
distinct count by exactly the copy factor and preserves each copy's
internal distributions verbatim.  HLL/KMV sketches, heavy hitters,
join-cardinality estimators and capture-recapture would therefore see
an artificial distinct-growth pattern a real 10x corpus never shows.

This tool generates a genuinely FRESH 10x-row corpus (seeded numpy
draws, no copies): 10x the entity counts of sf0.1 with the same
schemas, value domains and distribution shapes (profiled from
/root/testdata/sf0.1 — uniform keys, zipf-ish document vocabulary,
5-way categorical event types, TPC-H-like date/price ranges).  It is
an input for the Spark-vs-DuckDB differential on the
distinct/sketch/estimator family — both engines read the SAME parquet,
so the data need not match the driver generator byte-for-byte; it
needs the right CARDINALITY STRUCTURE.

Usage:
    python tools/freshdraw_sf1.py           # writes benchdata/freshdraw_sf1/
    python tools/differential_sf1.py \
        --sf-dir benchdata/freshdraw_sf1 \
        --only q50,q107,q153,q194,q196,q239,q273 \
        --out differential_freshdraw_r10.json
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT = os.path.join(_REPO, "benchdata", "freshdraw_sf1")

SEED = 4242
F = 10  # scale factor over sf0.1 entity counts

N_CUST = 15_000 * F
N_SUPP = 1_000 * F
N_PART = 20_000 * F
N_ORDERS = 150_000 * F
N_LINE = 600_000 * F
N_EVENTS = 100_000 * F
N_USERS = 1_500 * F
N_DOCS = 5_000 * F
N_VECS = 2_000 * F
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


def _ts_us(base: str, span_days: float, offs: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype("int64")
    us = base_us + (offs * span_days * 86_400e6).astype("int64")
    return pa.array(us, type=pa.timestamp("us"))


def _write(name: str, table: pa.Table) -> None:
    path = os.path.join(OUT, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def materialize() -> str:
    rng = np.random.default_rng(SEED)
    os.makedirs(OUT, exist_ok=True)

    # dimensions: copy verbatim (FK domains must match exactly)
    for t in ("nation", "region"):
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(OUT, f"{t}.parquet")
        )
        print(f"  {t}: copied")

    _write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(N_CUST), type=pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)]),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, N_CUST), type=pa.int32()
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, N_CUST), 2)
                ),
                "c_mktsegment": pa.array(
                    np.array(
                        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
                    )[rng.integers(0, 5, N_CUST)]
                ),
            }
        ),
    )

    _write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(N_SUPP), type=pa.int64()),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)]),
                "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), type=pa.int32()),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-999.99, 9999.99, N_SUPP), 2)
                ),
            }
        ),
    )

    _write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(N_PART), type=pa.int64()),
                "p_name": pa.array(
                    [
                        f"{_P_ADJ[a]} {_P_NOUN[b]}"
                        for a, b in zip(
                            rng.integers(0, 8, N_PART), rng.integers(0, 8, N_PART)
                        )
                    ]
                ),
                "p_brand": pa.array(
                    [f"Brand#{i}" for i in rng.integers(10, 55, N_PART)]
                ),
                "p_type": pa.array(
                    np.array(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"])[
                        rng.integers(0, 6, N_PART)
                    ]
                ),
                "p_size": pa.array(rng.integers(1, 51, N_PART), type=pa.int32()),
                "p_retailprice": pa.array(
                    np.round(rng.uniform(900.0, 2000.0, N_PART), 2)
                ),
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
                "o_orderkey": pa.array(np.arange(N_ORDERS), type=pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, N_CUST, N_ORDERS), type=pa.int64()
                ),
                "o_orderstatus": pa.array(
                    np.array(["O", "P", "F"])[rng.integers(0, 3, N_ORDERS)]
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000.0, 500000.0, N_ORDERS), 2)
                ),
                "o_orderdate": _ts_us(
                    "1995-01-01", 2400, np.floor(rng.uniform(0, 1, N_ORDERS) * 2400) / 2400
                ),
                "o_orderpriority": pa.array(
                    np.array(
                        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
                    )[rng.integers(0, 5, N_ORDERS)]
                ),
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
                    rng.integers(0, N_ORDERS, N_LINE), type=pa.int64()
                ),
                "l_partkey": pa.array(rng.integers(0, N_PART, N_LINE), type=pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LINE), type=pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, N_LINE), type=pa.int32()),
                "l_quantity": pa.array(
                    rng.integers(1, 51, N_LINE).astype("float64")
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900.0, 105000.0, N_LINE), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, N_LINE) / 100.0, 2)
                ),
                "l_tax": pa.array(np.round(rng.integers(0, 9, N_LINE) / 100.0, 2)),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, N_LINE)]
                ),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[rng.integers(0, 2, N_LINE)]
                ),
                "l_shipdate": _ts_us(
                    "1995-01-02", 2500, np.floor(rng.uniform(0, 1, N_LINE) * 2500) / 2500
                ),
            }
        ),
    )

    _write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(N_EVENTS), type=pa.int64()),
                "ts": _ts_us("2024-01-01", 30, rng.uniform(0, 1, N_EVENTS)),
                "user_id": pa.array(
                    rng.integers(0, N_USERS, N_EVENTS), type=pa.int64()
                ),
                "event_type": pa.array(
                    np.array(["view", "click", "purchase", "signup", "error"])[
                        rng.integers(0, 5, N_EVENTS)
                    ]
                ),
                "value": pa.array(np.round(rng.uniform(0, 560.0, N_EVENTS), 2)),
                "props": pa.array(
                    [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)]
                ),
            }
        ),
    )

    # documents: zipf-ish vocabulary so heavy-hitter thresholds see an
    # organic frequency tail (fresh draws per doc, not repeated texts)
    probs = 1.0 / np.arange(1, len(_WORDS) + 1) ** 1.1
    probs /= probs.sum()
    lengths = rng.integers(10, 60, N_DOCS)
    texts = [
        " ".join(rng.choice(_WORDS, n, p=probs)) for n in lengths
    ]
    _write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(N_DOCS), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(
                    np.array(["en", "de", "fr", "es"])[
                        rng.choice(4, N_DOCS, p=[0.85, 0.05, 0.05, 0.05])
                    ]
                ),
                "source": pa.array(
                    [f"src{s}" for s in rng.integers(0, 20, N_DOCS)]
                ),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts]), type=pa.int64()
                ),
            }
        ),
    )

    vecs = rng.normal(0, 0.3, (N_VECS, DIM)).astype("float32")
    _write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(N_VECS), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
                "label": pa.array(rng.integers(0, 8, N_VECS), type=pa.int32()),
            }
        ),
    )
    return OUT


if __name__ == "__main__":
    print(f"materializing fresh-draw sf1 corpus at {OUT} (seed {SEED})")
    materialize()
    print("done")
