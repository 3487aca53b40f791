"""Python DataSource V2 user streaming source (sources/python_source.py) —
the addSource/SourceFunction analogue (StreamSource.java:43,59-100).

Checks: streaming output equals the batch pipeline on the same elements,
the batch reader face works, partition splitting covers every element
exactly once, and trickle mode emits across multiple microbatches under a
processing-time trigger.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from mini_flink_spark.sources.python_source import (
    ElementsSource,
    elements_stream,
    register_elements_source,
)
from mini_flink_spark.streaming import run_stream_to_memory, wordcount_stream_update
from mini_flink_spark.streaming.wordcount import wordcount_batch

LINES = [
    "hello world",
    "hello flink",
    "spark streaming source",
    "hello world again",
]


def _counts(df) -> dict[str, int]:
    return {r["word"]: r["count"] for r in df.collect()}


def test_stream_equals_batch_wordcount(spark):
    stream = elements_stream(spark, LINES)
    out = run_stream_to_memory(wordcount_stream_update(stream, "value"), spark, "update")
    converged = out.groupBy("word").agg(F.max("count").alias("count"))
    batch = wordcount_batch(
        spark.createDataFrame([(l,) for l in LINES], "line string")
    )
    assert _counts(converged) == _counts(batch)
    assert _counts(converged)["hello"] == 3


def test_batch_reader_face(spark):
    import json

    register_elements_source(spark)
    df = (
        spark.read.format("mfs_elements")
        .option("elements", json.dumps(LINES))
        .load()
    )
    assert sorted(r["value"] for r in df.collect()) == sorted(LINES)


def test_partition_split_covers_all_elements_once(spark):
    import json

    register_elements_source(spark)
    many = [f"line {i}" for i in range(17)]
    df = (
        spark.read.format("mfs_elements")
        .option("elements", json.dumps(many))
        .option("n_splits", "5")
        .load()
    )
    got = sorted(r["value"] for r in df.collect())
    assert got == sorted(many)


def test_trickle_mode_multiple_microbatches(spark, tmp_path):
    """rows_per_batch > 0 + processing-time trigger: the offset walks forward
    stepwise — the run()-loop-under-engine-control shape. The sink must see
    more than one batch and converge to the full element set."""
    stream = elements_stream(spark, LINES, rows_per_batch=1)
    name = "trickle_sink"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table(name).count() >= len(LINES):
                break
            time.sleep(0.3)
        rows = sorted(r["value"] for r in spark.table(name).collect())
        assert rows == sorted(LINES)
        batches = len(q.recentProgress)
        assert batches >= 2, f"expected multiple microbatches, saw {batches}"
    finally:
        q.stop()


def test_source_name_contract():
    assert ElementsSource.name() == "mfs_elements"


def test_checkpoint_recovery_resumes_offset(spark, tmp_path):
    """Kill the stream mid-drain and restart from the checkpoint: the restored
    offset must skip already-committed elements (no loss; at most the single
    in-flight microbatch replays — standard at-least-once into the sink).
    The durable side is the Python DataSource V2 JSONL sink (the memory sink
    refuses checkpoint recovery), so this also exercises source offsets and
    sink batch manifests through a real stop/restart."""
    import json
    import os

    from mini_flink_spark.sources.python_sink import register_jsonl_sink

    register_elements_source(spark)
    register_jsonl_sink(spark)
    many = [f"item {i}" for i in range(12)]
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def reader(rows_per_batch: int):
        return (
            spark.readStream.format("mfs_elements")
            .option("elements", json.dumps(many))
            .option("rows_per_batch", str(rows_per_batch))
            .load()
        )

    def sink_rows() -> list[str]:
        rows = []
        if os.path.isdir(out):
            for name in sorted(os.listdir(out)):
                if name.endswith(".jsonl"):
                    with open(os.path.join(out, name)) as f:
                        rows.extend(json.loads(line)["value"] for line in f)
        return rows

    q1 = (
        reader(1).writeStream.format("mfs_jsonl")
        .option("path", out)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .option("checkpointLocation", ckpt)
        .start()
    )
    deadline = time.time() + 60
    while time.time() < deadline and len(sink_rows()) < 3:
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination(60)
    seen_a = sink_rows()
    assert len(seen_a) >= 3

    # NB: availableNow on a Python stream reader falls back to SINGLE-batch
    # execution (no SupportsTriggerAvailableNow), which after a restart is
    # just the WAL-replayed in-flight batch — drain with a processing-time
    # trigger instead and stop once everything has arrived.
    q2 = (
        reader(0).writeStream.format("mfs_jsonl")  # drain-the-rest mode
        .option("path", out)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .option("checkpointLocation", ckpt)
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline and set(sink_rows()) != set(many):
        time.sleep(0.3)
    q2.stop()
    q2.awaitTermination(60)
    all_rows = sink_rows()

    assert set(all_rows) == set(many)                      # nothing lost
    dupes = len(all_rows) - len(set(all_rows))
    assert dupes <= 1, f"more than the in-flight batch replayed: {dupes}"
    # per-batch commit manifests exist
    assert [n for n in os.listdir(out) if n.startswith("_COMMIT-")]
