"""Spec-level fuzz for q260 (STL-style decomposition, m74).

An independent Python mirror re-derives the decomposition from the
spec: daily cent sums, the ±3-ROW (present-days, not calendar-days)
moving window over the day-ordered series, integral division for the
micro-fp trend and the per-dow seasonal mean, residual as a
difference.  Both the Spark plan and the DuckDB oracle share one
derivation, so the differential cannot catch a shared mistake in the
window framing or the negative-sum division semantics; this mirror
can.  Negative values are the hard case: Spark's ``div`` and DuckDB's
``//`` both TRUNCATE toward zero (verified: ``-7 div 2 = -3`` on
both), so the mirror uses truncating division too — Python's ``//``
floors and would diverge on every negative seasonal sum.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_FP = 1_000_000
_EPOCH_DAY_BASE = 19_723  # 2024-01-01


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division — what Spark `div`/DuckDB `//` do."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _mirror(rows):
    """rows: (day_offset, cents).  Returns
    {epoch_day: (cents, dow, trend_micro, seasonal_micro, residual_micro)}."""
    daily = defaultdict(int)
    for off, c in rows:
        daily[_EPOCH_DAY_BASE + off] += c
    days = sorted(daily)
    trend = {}
    det = {}
    for i, d in enumerate(days):
        w = days[max(0, i - 3) : i + 4]
        wsum = sum(daily[x] for x in w)
        trend[d] = _tdiv(wsum * _FP, len(w))
        det[d] = daily[d] * _FP - trend[d]
    sdat = defaultdict(list)
    for d in days:
        sdat[d % 7].append(det[d])
    seasonal = {dow: _tdiv(sum(v), len(v)) for dow, v in sdat.items()}
    return {
        d: (
            daily[d],
            d % 7,
            trend[d],
            seasonal[d % 7],
            det[d] - seasonal[d % 7],
        )
        for d in days
    }


# day offsets with GAPS (the ROWS window spans present days only — a
# calendar-days reading would diverge exactly here) and signed cents
# (negative wsum/seasonal sums are where div semantics bite)
_rows = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-500, 500)),
    min_size=1,
    max_size=40,
)


@SLOW
@given(_rows)
def test_q260_matches_spec_mirror(spark, monkeypatch, rows):
    import lawfirm_data_pipeline_spark.oracle.m74_stl as m

    us_base = _EPOCH_DAY_BASE * 86_400_000_000
    df = spark.createDataFrame(
        [
            (i, i, us_base + off * 86_400_000_000 + (i % 7) * 3_600_000_000, "e", c / 100.0)
            for i, (off, c) in enumerate(rows)
        ],
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        "value",
    )
    monkeypatch.setattr(m, "load_table", lambda sp, sf, n, **kw: df)
    got = {
        # day string -> value tuple; epoch day back-computed from dow-free date
        r["day"]: (
            r["cents"],
            r["dow"],
            r["trend_micro"],
            r["seasonal_micro"],
            r["residual_micro"],
        )
        for r in m.q260_stl_decompose(spark, "unused").collect()
    }
    import datetime

    want = {
        (datetime.date(1970, 1, 1) + datetime.timedelta(days=d)).isoformat(): v
        for d, v in _mirror(rows).items()
    }
    assert got == want
