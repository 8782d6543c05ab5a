"""Generic paged external source (A19 generalized).

The reference's Places locator is a 1-seed → N-rows paginated scrape
(extractGooglePlaces.ts:137-349: page-count probe, per-card extraction,
next-page loop).  As a Spark source that shape is: seeds partitioned
across executors; each seed expands through a caller-supplied
``fetch_page(seed_row, page_idx) -> (rows, has_next)`` kernel inside
``mapInPandas``.  The external fetcher (browser/HTTP) is injected so
tests use deterministic fakes; the Spark plumbing — partitioning of
seeds, Arrow batching, explicit output schema, bounded page loop — is
the real contract.

Scale: seeds shuffle-free (mapInPandas over the seed scan), concurrency
= seed partitions (gate with pipeline.metrics.concurrency_gate to cap
concurrent external sessions, A27), per-seed page cap bounds worst-case
task time (A23's timeout wraps the fetcher itself).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def paged_source(
    seeds: DataFrame,
    fetch_page: Callable[[dict, int], tuple[list[dict], bool]],
    out_schema: T.StructType,
    max_pages: int = 20,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Expand each seed row into rows fetched page-by-page.

    ``fetch_page(seed, page_idx)`` returns (rows, has_next); iteration
    stops at ``max_pages`` (the reference caps its page loop the same
    way).  ``carry_cols`` are seed columns copied onto every emitted row
    (e.g. the seed id for the status write-back join).
    """
    carry = carry_cols or []
    out_cols = [f.name for f in out_schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for seed in pdf.to_dict("records"):
                for page in range(max_pages):
                    rows, has_next = fetch_page(seed, page)
                    for r in rows:
                        r = dict(r)
                        for c in carry:
                            r[c] = seed[c]
                        out.append(r)
                    if not has_next:
                        break
            yield pd.DataFrame(out, columns=out_cols)

    return seeds.mapInPandas(kernel, out_schema)
