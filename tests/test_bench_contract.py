"""Pins bench.py's driver output contract (VERDICT r3 #1: round 3's bench
artifact was unparseable because the stdout JSON line carried the full
184-query map and overflowed the driver's tail capture).

Contract: the LAST stdout line is ONE compact JSON object whose `queries`
map contains exactly the HEADLINE names (bounded size, ~41 entries), and the
full-registry map goes to BENCH_FULL.json instead. These tests exercise the
contract without running Spark (the expensive part is the queries, not the
serialization)."""

from __future__ import annotations

import json

import bench
from mini_flink_spark.queries import QUERIES


def test_headline_names_all_registered():
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"headline names not in registry: {missing}"


def test_headline_set_is_bounded():
    # the compact line must stay well under any plausible tail-capture
    # buffer; 50 names × ~40 bytes ≈ 2 KB
    assert len(bench.HEADLINE) <= 50


def test_compact_line_shape_and_size():
    # simulate the exact dict bench.main() prints, with worst-case values
    times = {n: 12345.678 for n in QUERIES}
    compact = json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(sum(times[n] for n in bench.HEADLINE), 3),
        "unit": "sec",
        "queries": {n: times.get(n) for n in bench.HEADLINE},
        "sf": 0.1,
    })
    parsed = json.loads(compact)
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert len(compact) < 4096, (
        f"compact bench line is {len(compact)} bytes — large enough to risk "
        "the driver's tail capture again"
    )


def test_quiet_start_guard_bounded(monkeypatch):
    """The load guard must (a) not wait when the machine is quiet, (b) give
    up after max_wait_s instead of blocking the bench forever on a machine
    that never goes quiet."""
    import os as _os
    import time as _time

    # quiet machine: returns immediately, no sleep calls
    sleeps: list[float] = []
    monkeypatch.setattr(_time, "sleep", lambda s: sleeps.append(s))
    monkeypatch.setattr(_os, "getloadavg", lambda: (0.1, 0.1, 0.1))
    bench.wait_for_quiet_machine(max_wait_s=5.0)
    assert sleeps == []

    # permanently loaded machine: bounded by the deadline (monotonic time is
    # advanced by the stubbed sleep so the loop terminates without waiting)
    clock = {"t": 1000.0}

    def fake_sleep(s):
        sleeps.append(s)
        clock["t"] += s

    monkeypatch.setattr(_time, "sleep", fake_sleep)
    monkeypatch.setattr(_time, "monotonic", lambda: clock["t"])
    monkeypatch.setattr(_os, "getloadavg", lambda: (999.0, 999.0, 999.0))
    bench.wait_for_quiet_machine(max_wait_s=30.0)
    assert sleeps and sum(sleeps) <= 40.0  # gave up near the deadline
