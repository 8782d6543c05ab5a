"""Pins for the fresh-draw sf1 corpus (r9 verdict task #5).

The cardinality-sensitive family (HLL, heavy hitters, join-card
estimators, capture-recapture, KMV) is differentialed on
benchdata/freshdraw_sf1 — genuinely fresh 10x draws, NOT key-shifted
copies.  These tests pin the generator's contract: schema identity
with the driver tables and fresh-draw (saturating, non-copy)
cardinality structure.  Skipped when the corpus has not been
materialized (python tools/freshdraw_sf1.py).
"""

from __future__ import annotations

import os

import pytest

_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata",
    "freshdraw_sf1",
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_DIR), reason="fresh-draw corpus not materialized"
)


def test_schemas_match_driver_tables():
    import pyarrow.parquet as pq

    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        want = pq.read_schema(f"/root/testdata/sf0.1/{t}.parquet")
        got = pq.read_schema(os.path.join(_DIR, f"{t}.parquet"))
        assert [(f.name, str(f.type)) for f in got] == [
            (f.name, str(f.type)) for f in want
        ], t


def test_rowcounts_are_10x():
    import pyarrow.parquet as pq

    for t, n in [
        ("orders", 1_500_000),
        ("lineitem", 6_000_000),
        ("events", 1_000_000),
        ("documents", 50_000),
        ("customer", 150_000),
    ]:
        assert pq.read_metadata(os.path.join(_DIR, f"{t}.parquet")).num_rows == n


def test_orderkey_multiplicity_is_fresh_not_copied():
    """Key-shifted copies preserve sf0.1's per-key line counts exactly
    (every orderkey present, multiplicities a verbatim repeat); fresh
    uniform draws leave a Poisson tail of orderkeys with NO lineitem
    at 4 lines/order (e^-4 ~ 1.8% of 1.5M ~ 27k absent keys)."""
    import duckdb

    con = duckdb.connect()
    absent = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{_DIR}/orders.parquet') o
        WHERE NOT EXISTS (SELECT 1 FROM
            read_parquet('{_DIR}/lineitem.parquet') l
            WHERE l.l_orderkey = o.o_orderkey)
        """
    ).fetchone()[0]
    # copies of sf0.1 would give exactly 10*(150000-147236) = 27640
    # absent keys, but per-copy IDENTICAL; the cheap distinguishing
    # fact is that fresh draws land in the Poisson band yet not on the
    # copy's exact figure
    assert 20_000 < absent < 35_000
    assert absent != 27_640
