"""Round-10 hardening: the rank family's enforced precondition + oracle-exact
percentile positions, and the sink's job-unique publish names.

VERDICT r9 #3 / ADVICE r9: `_range_sliced_rank` used to TRUST its
non-null/NaN-free slice precondition — a violation silently dropped rows at
the slice join. Now it raises per-row. ADVICE r9 also caught the percentile
position arithmetic flooring p*(n-1)+1.0 in doubles (an ulp below an integer
rounds across it); the fix floors p*(n-1) itself and adds 1 as an integer,
matching Spark percentile() / DuckDB quantile_cont bit-for-bit.
"""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from mini_flink_spark.queries_pipeline import (
    _percentile_cont_contrib,
    _range_sliced_rank,
)


def test_range_sliced_rank_null_slice_raises_not_drops(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("a", 3, 2.0)],
        "g string, id long, v double",
    )
    # the raise can fire as early as the helper's internal localCheckpoint,
    # so the construction itself sits inside the raises block
    with pytest.raises(Exception, match="_range_sliced_rank"):
        _range_sliced_rank(
            df, [F.asc("v"), F.asc("id")], F.col("v"), ["g"]
        ).collect()


def test_range_sliced_rank_nan_slice_raises_not_drops(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, float("nan")), ("a", 3, 2.0)],
        "g string, id long, v double",
    )
    with pytest.raises(Exception, match="_range_sliced_rank"):
        _range_sliced_rank(
            df, [F.asc("v"), F.asc("id")], F.col("v"), ["g"]
        ).collect()


def test_range_sliced_rank_coalesced_nulls_rank_cleanly(spark):
    # the documented caller-side remedy: coalesce NULL into a real value
    # consistent with the order (nulls-first ASC => below the min)
    df = spark.createDataFrame(
        [("a", 1, 3.0), ("a", 2, None), ("a", 3, 1.0), ("a", 4, None)],
        "g string, id long, v double",
    )
    keyed = df.withColumn("vk", F.coalesce("v", F.lit(-1.0)))
    got = {
        (r["id"]): r["rank"]
        for r in _range_sliced_rank(
            keyed, [F.asc("vk"), F.asc("id")], F.col("vk"), ["g"], n_slices=4
        ).collect()
    }
    assert got == {2: 1, 4: 2, 3: 3, 1: 4}


def test_percentile_positions_match_oracle_at_ulp_edges(spark):
    """Hunt the exact (p, n) pairs where the OLD arithmetic
    (floor(p*(n-1)+1.0) in doubles) and the oracle's (floor(p*(n-1)), then
    an integer +1) pick DIFFERENT ranks — p*(n-1) an ulp below an integer,
    where the double +1.0 rounds across it. Values are spaced 1e12 apart so
    an off-by-one rank is a ~1e12 error, unmistakable next to fp noise."""
    cases = [(1 / 49, 50), (1 / 49, 99), (2 / 49, 50), (1 / 49, 197)]
    for p, n in cases:
        pos = p * (n - 1)
        # confirm these really are the disagreement points: the old double
        # +1.0 lands ON the next integer, the integer-add-after-floor not
        assert math.floor(pos + 1.0) != math.floor(pos) + 1, (p, n, pos)
    for p, n in cases:
        df = spark.createDataFrame(
            [("z", i, float(i) * 1e12) for i in range(n)],
            "g string, id long, v double",
        )
        ranked = _range_sliced_rank(
            df, [F.asc("v"), F.asc("id")], F.col("v"), ["g"], n_slices=4,
            total_col="_n",
        )
        got = ranked.groupBy("g").agg(
            F.sum(_percentile_cont_contrib(p, "v")).alias("x")
        ).collect()[0]["x"]
        exp = df.selectExpr(f"percentile(v, {p!r}) as x").collect()[0]["x"]
        # EXACT equality: the fixed arithmetic performs the oracle's own
        # double ops (frac on the same idx, two products, one add of exact
        # zeros elsewhere); the old arithmetic returned the pure upper
        # order statistic here instead of the epsilon blend — different bits
        assert got == exp, (p, n, got, exp)


def test_percentile_contrib_boundary_ps(spark):
    df = spark.createDataFrame(
        [("z", i, float(i)) for i in range(10)], "g string, id long, v double"
    )
    ranked = _range_sliced_rank(
        df, [F.asc("v"), F.asc("id")], F.col("v"), ["g"], n_slices=4,
        total_col="_n",
    )
    for p, want in ((0.0, 0.0), (1.0, 9.0), (0.5, 4.5)):
        got = ranked.groupBy("g").agg(
            F.sum(_percentile_cont_contrib(p, "v")).alias("x")
        ).collect()[0]["x"]
        assert got == pytest.approx(want, abs=1e-12)


def test_batch_sink_second_job_appends_instead_of_clobbering(tmp_path):
    """ADVICE r9 (medium): partition-only part names made a second
    non-overwrite job to the same directory silently clobber the first
    job's files. The job token (minted per writer instance on the driver)
    keeps retry-idempotency within a job while separating jobs."""
    from pyspark.sql import Row

    from mini_flink_spark.sources.python_sink import _JsonlBatchWriter

    out = str(tmp_path / "append_out")
    j1 = _JsonlBatchWriter({"path": out})
    j2 = _JsonlBatchWriter({"path": out})
    m1 = j1.write(iter([Row(id=i) for i in range(5)]))
    m2 = j2.write(iter([Row(id=i) for i in range(5, 9)]))
    assert m1.path != m2.path, "cross-job part names must not collide"
    # within-job determinism still holds: a retry republishes the same path
    m1r = j1.write(iter([Row(id=i) for i in range(5)]))
    assert m1r.path == m1.path
    j1.commit([m1r])
    j2.commit([m2])
    rows = []
    for name in sorted(os.listdir(out)):
        if name.endswith(".jsonl"):
            with open(os.path.join(out, name)) as f:
                rows.extend(json.loads(line)["id"] for line in f)
    assert sorted(rows) == list(range(9))
