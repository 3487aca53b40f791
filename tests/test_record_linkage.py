"""record_linkage_customers: the hot-block cap (round 6). Oracle parity is
auto-covered by test_oracle_parity; these pin the guard-rail semantics."""

from __future__ import annotations

import os
import tempfile

from mini_flink_spark import queries_pipeline as QP
from mini_flink_spark.queries import QUERIES


def _customers(spark, rows):
    return spark.createDataFrame(
        rows, "c_custkey bigint, c_name string, c_nationkey bigint, c_mktsegment string"
    )


def test_hot_block_dropped_small_block_kept(spark, monkeypatch):
    """One block of 5 rows (over a patched cap of 4) must vanish from
    candidate generation; the small block's matches survive."""
    monkeypatch.setattr(QP, "MAX_LINKAGE_BLOCK", 4)
    rows = [(i, f"Customer#{i:09d}", 1, "AUTO") for i in range(5)] + [
        (10, "Customer#000000010", 2, "CAR"),
        (11, "Customer#000000011", 2, "CAR"),  # ed=1 vs 10
    ]
    d = tempfile.mkdtemp(prefix="rl_t_")
    _customers(spark, rows).write.mode("overwrite").parquet(
        os.path.join(d, "customer.parquet")
    )
    out = QUERIES["record_linkage_customers"].fn(spark, d).collect()
    got = sorted((r.a, r.b) for r in out)
    # the AUTO block (ed<=2 pairs exist: 0-1, 0-2, ...) was dropped entirely;
    # only the 2-row CAR block's pair remains
    assert got == [(10, 11)], got


def test_cap_inactive_below_threshold(spark):
    """At the shipped cap (100k) the fixture blocks never trip it — results
    equal the uncapped quadratic within each block."""
    rows = [
        (1, "Customer#000000001", 1, "AUTO"),
        (2, "Customer#000000002", 1, "AUTO"),  # ed=1 vs 1
        (3, "Customer#000000999", 1, "AUTO"),  # ed>2 vs both
        (4, "Customer#000000001", 2, "AUTO"),  # same name, other block: no pair
    ]
    d = tempfile.mkdtemp(prefix="rl_t2_")
    _customers(spark, rows).write.mode("overwrite").parquet(
        os.path.join(d, "customer.parquet")
    )
    out = QUERIES["record_linkage_customers"].fn(spark, d).collect()
    assert sorted((r.a, r.b, r.dist) for r in out) == [(1, 2, 1)]
