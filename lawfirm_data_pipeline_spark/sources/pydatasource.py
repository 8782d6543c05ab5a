"""A19's paged external source as a REGISTERED Spark 4 Python
DataSource (``spark.read.format("paged_demo")``).

``sources/paged.py`` expresses the paged-scrape shape as a mapInPandas
kernel over a seed DataFrame; this module is the same contract as a
first-class connector on the Python Data Source API (Spark 4): the
planner asks for partitions (one per seed — the unit of external-fetch
parallelism, exactly how the reference fans its Places seeds across
workers), and each executor task walks that seed's page loop
independently.  No driver-side fetching, no collect: page iteration
happens inside the task, and Spark sees an ordinary scan it can
project/filter above.

The built-in fetcher is deterministic synthetic paging (seed s yields
``2 + s % 3`` pages of 3 items whose value encodes (seed, page, item)),
so the connector sits under the driver's DuckDB VALUE gate (q202) —
the oracle regenerates the identical page space from generate_series.
A real deployment subclasses ``_fetch_page`` with the HTTP/browser
kernel; partition planning, option plumbing, schema declaration, and
the bounded page loop are what this module pins.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def page_rows(seed: int, page: int) -> list[tuple[int, int, int, int]]:
    """Deterministic page payload: 3 items per page, value encodes the
    (seed, page, item) coordinates so any dropped/duplicated row moves
    the checksum."""
    return [
        (seed, page, item, seed * 1000 + page * 10 + item) for item in range(3)
    ]


def n_pages(seed: int) -> int:
    return 2 + seed % 3


class PagedDemoDataSource(DataSource):
    """``format("paged_demo")`` — options: ``seeds`` (count, default 8),
    ``max_pages`` (safety cap, default 20, the A23-style bound)."""

    @classmethod
    def name(cls) -> str:
        return "paged_demo"

    def schema(self) -> str:
        return "seed int, page int, item int, value bigint"

    def reader(self, schema) -> "PagedDemoReader":
        return PagedDemoReader(
            int(self.options.get("seeds", 8)),
            int(self.options.get("max_pages", 20)),
        )

    def simpleStreamReader(self, schema) -> "PagedDemoStreamReader":
        return PagedDemoStreamReader(
            int(self.options.get("seeds", 8)),
            int(self.options.get("max_pages", 20)),
        )


class PagedDemoReader(DataSourceReader):
    def __init__(self, seeds: int, max_pages: int) -> None:
        self.seeds = seeds
        self.max_pages = max_pages

    def partitions(self):
        # one partition per seed: external-fetch parallelism == seed
        # count, and a straggling seed delays only its own task
        return [InputPartition(s) for s in range(self.seeds)]

    def read(self, partition: InputPartition):
        seed = partition.value
        for page in range(min(n_pages(seed), self.max_pages)):
            yield from page_rows(seed, page)


class PagedDemoStreamReader(SimpleDataSourceStreamReader):
    """The same paged space as a STREAMING source (Spark 4
    ``simpleStreamReader``): micro-batch N carries page N of every seed
    that still has one — the page loop becomes the offset axis, so a
    restarted query replays exactly the uncommitted pages
    (``readBetweenOffsets`` is the recovery contract).  A real
    deployment polls an external cursor the same way; the offset dict
    is whatever token the remote paging API hands back."""

    def __init__(self, seeds: int, max_pages: int) -> None:
        self.seeds = seeds
        self.cap = min(max(n_pages(s) for s in range(seeds)), max_pages)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _page(self, page: int):
        for s in range(self.seeds):
            if page < n_pages(s):
                yield from page_rows(s, page)

    def read(self, start: dict):
        # two pages per micro-batch: still a real multi-batch stream
        # (offsets advance incrementally, recovery replays a range) at
        # half the per-trigger Python-worker round trips
        page = start["page"]
        if page >= self.cap:
            return iter([]), start
        upto = min(page + 2, self.cap)
        rows = [r for p in range(page, upto) for r in self._page(p)]
        return iter(rows), {"page": upto}

    def readBetweenOffsets(self, start: dict, end: dict):
        for p in range(start["page"], end["page"]):
            yield from self._page(p)


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(PagedDemoDataSource)
