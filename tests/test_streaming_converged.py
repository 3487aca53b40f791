"""Structural convergence of the update-mode stream drain (ADVICE r6).

The old memory-sink drain returned a converged table only because
AvailableNow + an unset maxFilesPerTrigger processed the whole file fixture
as ONE microbatch — with several batches, update mode leaves one row per
(key, batch-that-updated-it) and stale partial aggregates poison the result.
`run_stream_to_memory(converge_keys=...)` must return the latest update per
key for ANY batch count; this test forces a genuinely multi-batch run with
maxFilesPerTrigger=1 and checks the drained result against the batch plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_flink_spark.sources import parquet_stream, write_stream_fixture
from mini_flink_spark.streaming import run_stream_to_memory
from mini_flink_spark.streaming.wordcount import LAST_PROGRESS


def test_multibatch_update_drain_converges(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "event_type")

    fixture = write_stream_fixture(ev, str(tmp_path / "fix"), n_files=3)
    stream = parquet_stream(
        spark, fixture, "user_id bigint, event_type string", max_files_per_trigger=1
    )
    counts = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    drained = run_stream_to_memory(
        counts, spark, "update", query_name="t_conv", converge_keys=["event_type"]
    )

    # precondition: the run really was multi-batch (batchId is 0-based), so a
    # green assert below can't be the single-batch accident being re-proven
    assert LAST_PROGRESS["t_conv"]["batchId"] >= 2

    expect = {
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n")).collect()
    }
    got = {(r["event_type"], r["n"]) for r in drained.collect()}
    assert got == expect


def test_converge_keys_rejects_append_mode(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts")
    fixture = write_stream_fixture(ev, str(tmp_path / "fix2"), n_files=2)
    stream = parquet_stream(spark, fixture, "user_id bigint, ts timestamp")
    import pytest

    with pytest.raises(ValueError, match="update-mode drain"):
        run_stream_to_memory(
            stream, spark, "append", converge_keys=["user_id"]
        )
