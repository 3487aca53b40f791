"""Python DataSource V2 user sink (sources/python_sink.py) — the addSink
analogue with two-phase commit: staged write-once files published by rename,
driver-side _SUCCESS/_COMMIT manifests, abort cleanup."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from mini_flink_spark.operators.stream import DataStream
from mini_flink_spark.sources.python_source import elements_stream


def _read_jsonl_dir(path: str) -> list[dict]:
    rows = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".jsonl"):
            with open(os.path.join(path, name)) as f:
                rows.extend(json.loads(line) for line in f)
    return rows


def test_batch_sink_writes_all_rows_and_success_marker(spark, tmp_path):
    out = str(tmp_path / "batch_out")
    ds = DataStream(spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v")))
    ds.write_jsonl_sink(out)
    rows = _read_jsonl_dir(out)
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert all(r["v"] == r["id"] * 2 for r in rows)
    success = json.load(open(os.path.join(out, "_SUCCESS")))
    assert success["rows"] == 100
    # no staging leftovers
    assert not [n for n in os.listdir(out) if n.endswith(".staging")]


def test_streaming_sink_commits_batch_manifest(spark, tmp_path):
    out = str(tmp_path / "stream_out")
    lines = ["alpha", "beta", "gamma", "delta"]
    ds = DataStream(elements_stream(spark, lines))
    ds.write_jsonl_sink(out, checkpoint=str(tmp_path / "ckpt"))
    rows = _read_jsonl_dir(out)
    assert sorted(r["value"] for r in rows) == sorted(lines)
    manifests = [n for n in os.listdir(out) if n.startswith("_COMMIT-")]
    assert manifests, "driver-side per-batch commit manifest missing"
    m = json.load(open(os.path.join(out, manifests[0])))
    assert m["rows"] == len(lines)
    for f in m["files"]:
        assert os.path.exists(f)


def test_batch_sink_overwrite_truncates_prior_run(spark, tmp_path):
    """mode('overwrite') against a stable path must be idempotent: the
    driver-side truncate removes the prior run's published files, _SUCCESS,
    and any stale staging leftovers — the contract sink_roundtrip_jsonl's
    deterministic fixture dir depends on (a second run must not double the
    row count)."""
    from mini_flink_spark.sources.python_sink import SINK_NAME, register_jsonl_sink

    register_jsonl_sink(spark)
    out = str(tmp_path / "ow_out")
    df = spark.range(50).select(F.col("id"))
    df.write.format(SINK_NAME).mode("overwrite").option("path", out).save()
    # plant a stale staging file (a crashed prior task) — overwrite sweeps it
    open(os.path.join(out, "stale-deadbeef.jsonl.staging"), "w").write("{}\n")
    df.write.format(SINK_NAME).mode("overwrite").option("path", out).save()
    rows = _read_jsonl_dir(out)
    assert sorted(r["id"] for r in rows) == list(range(50))
    assert json.load(open(os.path.join(out, "_SUCCESS")))["rows"] == 50
    assert not [n for n in os.listdir(out) if n.endswith(".staging")]


# --- abort/retry semantics (VERDICT r8 #6): the docstring's strongest claim
# ("a retried or zombie task can never corrupt published output") exercised
# directly against the writer machinery. These drive _JsonlBatchWriter
# outside a task (TaskContext absent -> partition 0), which is exactly the
# file-contract surface: Spark's scheduler guarantees only successful
# attempts' messages reach commit(); everything below that line is ours.


def _row_iter(n, fail_at=None):
    from pyspark.sql import Row

    for i in range(n):
        if fail_at is not None and i == fail_at:
            raise RuntimeError("injected task death mid-write")
        yield Row(id=i, v=i * 2)


def test_midwrite_failure_never_publishes_then_retry_is_exactly_once(tmp_path):
    from mini_flink_spark.sources.python_sink import _JsonlBatchWriter

    out = str(tmp_path / "retry_out")
    w = _JsonlBatchWriter({"path": out})
    # attempt 0 dies mid-iteration: only an attempt-unique .staging may
    # remain; nothing is published, so readers never see partial rows
    try:
        w.write(_row_iter(100, fail_at=40))
        raise AssertionError("injected failure did not propagate")
    except RuntimeError:
        pass
    assert not [n for n in os.listdir(out) if n.endswith(".jsonl")]
    leftovers = [n for n in os.listdir(out) if n.endswith(".staging")]
    assert leftovers, "failed attempt should leave its staging file only"
    # attempt 1 (the retry) processes the same partition to completion
    msg = w.write(_row_iter(100))
    w.commit([msg])
    rows = _read_jsonl_dir(out)
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert len([n for n in os.listdir(out) if n.endswith(".jsonl")]) == 1
    assert json.load(open(os.path.join(out, "_SUCCESS")))["rows"] == 100


def test_zombie_attempt_publish_is_idempotent(tmp_path):
    # a zombie: attempt 0 runs write() to completion (its rename landed)
    # but the scheduler discards its commit message; the retry publishes
    # the same row set onto the SAME deterministic part name — atomic
    # last-writer-wins, so the directory still reads exactly-once
    from mini_flink_spark.sources.python_sink import _JsonlBatchWriter

    out = str(tmp_path / "zombie_out")
    w = _JsonlBatchWriter({"path": out})
    zombie_msg = w.write(_row_iter(77))  # message dropped on the floor
    retry_msg = w.write(_row_iter(77))
    assert zombie_msg.path == retry_msg.path  # deterministic publish path
    w.commit([retry_msg])
    rows = _read_jsonl_dir(out)
    assert sorted(r["id"] for r in rows) == list(range(77))
    assert len([n for n in os.listdir(out) if n.endswith(".jsonl")]) == 1
    assert json.load(open(os.path.join(out, "_SUCCESS")))["rows"] == 77


def test_job_abort_removes_published_files(tmp_path):
    from mini_flink_spark.sources.python_sink import _JsonlBatchWriter

    out = str(tmp_path / "abort_out")
    w = _JsonlBatchWriter({"path": out})
    msg = w.write(_row_iter(10))
    assert os.path.exists(msg.path)
    w.abort([msg, None])  # None: a task that never produced a message
    assert not os.path.exists(msg.path)
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
