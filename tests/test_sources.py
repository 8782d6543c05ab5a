"""Source connectors: csv/json round-trips with pinned schemas,
partitioned writes prune on read, paged-source expansion."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from lawfirm_data_pipeline_spark.io import load_table
from lawfirm_data_pipeline_spark.sources import paged_source, read_table, write_table

SF = "/root/testdata/sf0.01"


def rows(df):
    return sorted(repr(tuple(r)) for r in df.collect())


def test_events_ts_unit_canary(spark):
    """The driver regenerated events.ts with a different parquet unit
    once already (r1 NANOS → r2 MICROS), which silently rescaled every
    timestamp 1000×.  Pin the decoded range to the generator's documented
    window (Jan 2024) so a future flip fails here in seconds instead of
    as four cryptic driver hash mismatches."""
    import datetime

    for sf in ("/root/testdata/sf0.001", SF):
        lo, hi = load_table(spark, sf, "events").select(F.min("ts"), F.max("ts")).first()
        assert datetime.datetime(2024, 1, 1) <= lo <= hi < datetime.datetime(2024, 2, 1), (
            f"{sf}: events.ts decoded to [{lo}, {hi}] — parquet unit mismatch?"
        )


def test_csv_round_trip_preserves_values(spark):
    nation = load_table(spark, SF, "nation")
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "nation_csv")
        write_table(nation, p, fmt="csv")
        back = read_table(spark, p, nation.schema, fmt="csv")
        assert rows(back) == rows(nation)


def test_json_round_trip_preserves_values(spark):
    region = load_table(spark, SF, "region")
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "region_json")
        write_table(region, p, fmt="json")
        back = read_table(spark, p, region.schema, fmt="json")
        assert rows(back) == rows(region)


def test_partitioned_write_prunes_on_read(spark):
    orders = load_table(spark, SF, "orders").limit(2000)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "orders_part")
        write_table(orders, p, partition_by=["o_orderstatus"])
        # partition dirs exist
        assert any(e.startswith("o_orderstatus=") for e in os.listdir(p))
        back = spark.read.parquet(p).filter(F.col("o_orderstatus") == "O")
        import io as _io
        from contextlib import redirect_stdout

        buf = _io.StringIO()
        with redirect_stdout(buf):
            back.explain(True)
        plan = buf.getvalue()
        assert "PartitionFilters" in plan and "o_orderstatus" in plan


def test_paged_source_expands_and_carries_seed_cols(spark):
    seeds = spark.createDataFrame([(1, "u1"), (2, "u2")], "seed_id int, url string")
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("page", T.IntegerType()),
            T.StructField("seed_id", T.IntegerType()),
        ]
    )

    def fake_fetch(seed, page):
        # seed 1 has 2 pages x 2 rows; seed 2 has 1 page x 1 row
        n_pages = 2 if seed["seed_id"] == 1 else 1
        rows_ = [
            {"name": f"s{seed['seed_id']}p{page}r{i}", "page": page} for i in range(2 if seed["seed_id"] == 1 else 1)
        ]
        return rows_, page + 1 < n_pages

    out = paged_source(seeds, fake_fetch, schema, max_pages=5, carry_cols=["seed_id"])
    got = {(r.seed_id, r.page, r.name) for r in out.collect()}
    assert got == {
        (1, 0, "s1p0r0"), (1, 0, "s1p0r1"),
        (1, 1, "s1p1r0"), (1, 1, "s1p1r1"),
        (2, 0, "s2p0r0"),
    }


def test_paged_source_respects_max_pages(spark):
    seeds = spark.createDataFrame([(1,)], "seed_id int")
    schema = T.StructType([T.StructField("page", T.IntegerType())])

    def endless(seed, page):
        return [{"page": page}], True

    out = paged_source(seeds, endless, schema, max_pages=3)
    assert out.count() == 3
