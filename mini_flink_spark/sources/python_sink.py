"""User-defined sink via the Python DataSource V2 writer API — the
``addSink(new SinkFunction(){invoke})`` analogue (StreamSink.java:54-58)
with the two-phase commit contract the reference never had: each task
writes its partition and returns a commit message; the driver's ``commit``
publishes, ``abort`` discards — per batch on the streaming path.

``JsonlDirSink`` is the concrete instance: rows append as JSON-lines files,
one file per (task, attempt) staged under a temp name and published by
task-side rename — write-once files, so a retried/zombie task never
corrupts published output (the Hadoop-committer idea in one page). At
scale this is the shape of any object-store sink: task-local staging,
idempotent publish, driver-side manifest.

``foreachBatch``/``foreach`` remain the quick path for arbitrary user code;
this is the engine-controlled contract (schema known up front, per-batch
commit/abort, no driver round-trip per row).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row

SINK_NAME = "mfs_jsonl"


@dataclass
class _FileCommit(WriterCommitMessage):
    path: str
    n_rows: int


def _write_jsonl(
    path_dir: str, prefix: str, rows: Iterator[Row], basename: str = None
) -> _FileCommit:
    """Stage-then-rename publish. The STAGING name is always attempt-unique
    (uuid) so concurrent speculative attempts never interleave writes; the
    FINAL name is `basename` when given (deterministic publish: a retry or
    zombie attempt renames the same row set onto the same path — atomic
    last-writer-wins with identical content, i.e. idempotent), else a uuid
    (callers that publish via a commit manifest instead)."""
    os.makedirs(path_dir, exist_ok=True)
    final = os.path.join(path_dir, basename or f"{prefix}-{uuid.uuid4().hex}.jsonl")
    staged = f"{final}.{uuid.uuid4().hex}.staging"
    n = 0
    with open(staged, "w") as f:
        for row in rows:
            f.write(json.dumps(row.asDict(), default=str) + "\n")
            n += 1
    os.rename(staged, final)  # atomic publish of a write-once file
    return _FileCommit(path=final, n_rows=n)


class _JsonlBatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        # Job-unique token, minted ON THE DRIVER at write-planning time and
        # pickled to every task (ADVICE r9): final names are deterministic
        # WITHIN a job (stable across task retries/zombies — same writer
        # instance, same token) but distinct ACROSS jobs, so a second
        # non-overwrite write to the same directory appends instead of
        # silently clobbering the first job's part files. This mirrors what
        # native file committers actually do — their part names embed a
        # job-unique UUID alongside the partition id.
        self.job_token = uuid.uuid4().hex[:12]

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        # Deterministic per-(job, partition) file name: a task retried after
        # a mid-write failure republishes the SAME path (the failed attempt
        # left only an ignored .staging), and a zombie attempt that already
        # renamed simply gets overwritten by the retry's identical row set —
        # so directory listings of *.jsonl are exactly-once without needing
        # the commit manifest. Fully uuid names would leak a zombie's orphan
        # file into readers; partition-only names would collide across jobs.
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        return _write_jsonl(
            self.path,
            "part",
            iterator,
            basename=f"part-{pid:05d}-{self.job_token}.jsonl",
        )

    def commit(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        # _SUCCESS records THIS job's row count; under append-style reuse of
        # a directory (now safe — part names embed the job token) the marker
        # reflects the most recent job, not the directory total, matching
        # native committers' last-job-wins _SUCCESS semantics.
        total = sum(m.n_rows for m in messages if m is not None)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(json.dumps({"rows": total}))

    def abort(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class _JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        return _write_jsonl(self.path, "batch", iterator)

    def commit(self, messages: List[Optional[WriterCommitMessage]], batchId: int) -> None:
        total = sum(m.n_rows for m in messages if m is not None)
        manifest = os.path.join(self.path, f"_COMMIT-{batchId}")
        with open(manifest, "w") as f:
            f.write(json.dumps(
                {"batch": batchId, "rows": total,
                 "files": [m.path for m in messages if m is not None]}))

    def abort(self, messages: List[Optional[WriterCommitMessage]], batchId: int) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlDirSink(DataSource):
    """Batch + streaming JSON-lines directory sink. Option: ``path``."""

    @classmethod
    def name(cls) -> str:
        return SINK_NAME

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        # Overwrite semantics are a DRIVER-side truncate before any task
        # runs (this method executes on the driver; the writer is then
        # pickled to executors): published write-once files of a prior run
        # are removed so mode("overwrite") against a stable path is
        # idempotent — the same contract Spark's native file sinks give.
        # Only this sink's own artifacts are touched, never the directory.
        # KNOWN WINDOW (shared with native Spark file-sink overwrite): the
        # truncate happens at write-PLANNING time, so a job that fails after
        # this point leaves the destination already emptied of the prior
        # run's rows; readers between truncate and commit see an empty or
        # partial dir. _SUCCESS absence is the incompleteness signal — a
        # correct reader checks it. A stricter variant would sweep old files
        # in commit() from the staged manifest instead.
        if overwrite:
            path = self.options.get("path")
            if path and os.path.isdir(path):
                for name in os.listdir(path):
                    if name.endswith((".jsonl", ".staging")) or name.startswith(
                        ("_SUCCESS", "_COMMIT-")
                    ):
                        os.remove(os.path.join(path, name))
        return _JsonlBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _JsonlStreamWriter(self.options)


_REGISTERED: set[int] = set()


def register_jsonl_sink(spark) -> None:
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(JsonlDirSink)
        _REGISTERED.add(key)
