"""bench.py's final stdout line must carry all per-query timings within
the driver's ~2000-char stdout parse window (r9 verdict task #7).

The driver stores the parsed final line as BENCH_r{N}.json["parsed"];
round-over-round per-query comparison needs every timing in there, so
``short_line`` encodes integer milliseconds in registry order plus a
name-order hash.  These tests pin: full-map presence, reconstruction,
the char budget at 299-query scale, and the shed order under pressure.
"""

from __future__ import annotations

import hashlib
import json

from bench import short_line


def _fake_timings(n: int) -> dict[str, float]:
    # realistic shape: mostly sub-second, a few multi-second heads
    return {
        f"q{i:03d}_some_operator_name": (0.05 + (i % 37) * 0.031 + (3.0 if i % 97 == 0 else 0.0))
        for i in range(n)
    }


def test_short_line_carries_all_299_timings_within_budget():
    t = _fake_timings(299)
    load = {"start": {"loadavg": [4.9, 5.4, 5.5], "cpus": 32},
            "end": {"loadavg": [5.9, 5.4, 5.3], "cpus": 32}}
    solo = {"trigger": "start loadavg1 4.9 > 1.0", "host_load_at_rerun": load["end"],
            "queries": {}, "value_heads_sweep": 26.17, "value_heads_solo": 21.1}
    line = short_line(t, sum(t.values()), 0.1, load, solo)
    assert len(line) < 2000
    d = json.loads(line)
    assert len(d["t_ms"]) == 299
    assert d["t_ms_order"] == "registry"
    # reconstruction: registry order + t_ms → the full map in ms
    names = list(t)
    assert d["names_md5"] == hashlib.md5("\n".join(names).encode()).hexdigest()[:8]
    rebuilt = dict(zip(names, d["t_ms"]))
    for n_, secs in t.items():
        assert rebuilt[n_] == int(round(secs * 1000))


def test_short_line_sheds_extras_before_t_ms():
    # Long names blow the budget: t_ms must survive, extras shed in order
    t = {f"q{i}_{'x' * 40}": 0.1 for i in range(299)}
    line = short_line(t, 29.9, 0.1, {"start": {}, "end": {}}, None, budget=1500)
    d = json.loads(line)
    assert len(d["t_ms"]) == 299
    assert "queries" not in d  # the 5-slowest name map shed first
    assert "queries" in d["trimmed"]


def test_short_line_last_resort_drops_t_ms_not_parseability():
    """Multi-second per-query sweeps (sf1+) can outgrow the window on
    t_ms alone: the final fallback drops t_ms (pointing at
    bench_queries.json) rather than ship an unparseable line."""
    t = {f"q{i:03d}": 100.0 + i for i in range(299)}  # 6-digit ms each
    line = short_line(t, sum(t.values()), 1.0, {"start": {}, "end": {}}, None, budget=800)
    assert len(line) < 2000
    d = json.loads(line)
    assert "t_ms" not in d and "t_ms" in d["trimmed"]
    assert d["queries_file"] == "bench_queries.json"
