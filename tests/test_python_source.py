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
