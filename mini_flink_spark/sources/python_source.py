"""User-defined streaming source via the Python DataSource V2 API.

Closes the one reference API without a built-in Spark analogue: an arbitrary
user source emitting records under engine control —
``SourceFunction.run(ctx)/cancel()``
(flink-streaming-java/.../api/functions/source/SourceFunction.java) executed
by ``StreamSource`` (StreamSource.java:43,59-100) after registration through
``StreamExecutionEnvironment.addSource`` (StreamExecutionEnvironment.java:187).
Spark 4's ``spark.dataSource.register`` gives Python the same contract:
the engine asks the source for offsets and pulls partitions of rows, the
source decides what those rows are.

``ElementsSource`` is the ``fromElements``-shaped instance: a deterministic,
bounded generator over a user-supplied element list, emitted ``rows_per_batch``
per microbatch — the offset walk is the run() loop, stream end is the
``cancel()``/bounded-run analogue (the reference's run() returning ends the
stream the same way, EndOfPartitionEvent cascade).

Scale note: `partitions()` splits each offset range so a real source (kafka-
like cursor, object-store listing, service scrape) fans out across executors;
the element payload rides the partition object only at fixture sizes.
"""

from __future__ import annotations

import json
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SOURCE_NAME = "mfs_elements"


class _Range(InputPartition):
    def __init__(self, elements: list[str], start: int, end: int):
        self.elements = elements
        self.start = start
        self.end = end


class _ElementsStreamReader(DataSourceStreamReader):
    """Offset = number of elements already emitted.

    latestOffset reports ALL currently-available elements (the availableNow
    contract: the trigger captures latestOffset once at start and drains to
    it — an offset that trickles forward would silently truncate the drain).
    ``rows_per_batch > 0`` opts into trickle mode for processing-time
    triggers: the offset advances stepwise, one microbatch per step — the
    run()-loop-under-engine-control shape.

    Engine caveat: Python stream readers don't implement
    SupportsTriggerAvailableNow, so Trigger.AvailableNow falls back to
    SINGLE-batch execution — fine for the drain-all default (one batch covers
    everything), but after a checkpoint restart that single batch is only the
    WAL-replayed in-flight batch; use a processing-time trigger to drain the
    remainder (pinned in tests/test_python_source.py recovery test)."""

    def __init__(self, options):
        self.elements: list[str] = json.loads(options.get("elements") or "[]")
        self.rows_per_batch = int(options.get("rows_per_batch") or 0)
        self.n_splits = int(options.get("n_splits") or 2)
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        if self.rows_per_batch <= 0:
            self._latest = len(self.elements)
        else:
            self._latest = min(self._latest + self.rows_per_batch, len(self.elements))
        return {"offset": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:
            return [_Range(self.elements, lo, lo)]
        step = max(1, (hi - lo + self.n_splits - 1) // self.n_splits)
        return [
            _Range(self.elements, i, min(i + step, hi))
            for i in range(lo, hi, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (partition.elements[i],)

    def commit(self, end: dict) -> None:
        pass


class _ElementsBatchReader(DataSourceReader):
    def __init__(self, options):
        self.elements: list[str] = json.loads(options.get("elements") or "[]")
        self.n_splits = int(options.get("n_splits") or 2)

    def partitions(self) -> Sequence[InputPartition]:
        n = len(self.elements)
        step = max(1, (n + self.n_splits - 1) // self.n_splits)
        return [_Range(self.elements, i, min(i + step, n)) for i in range(0, n, step)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (partition.elements[i],)


class ElementsSource(DataSource):
    """``addSource(new MySourceFunction())`` analogue: batch + streaming reads
    of a user-defined element generator. Options: ``elements`` (JSON list of
    strings), ``rows_per_batch``, ``n_splits``."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> DataSourceReader:
        return _ElementsBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _ElementsStreamReader(self.options)


_REGISTERED: set[int] = set()


def register_elements_source(spark) -> None:
    """Idempotent per-session registration."""
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(ElementsSource)
        _REGISTERED.add(key)


def elements_stream(spark, elements: list[str], rows_per_batch: int = 0, n_splits: int = 2):
    """Streaming DataFrame of (value string) emitting `elements` under engine
    control — the fromElements-as-a-stream surface."""
    register_elements_source(spark)
    return (
        spark.readStream.format(SOURCE_NAME)
        .option("elements", json.dumps(elements))
        .option("rows_per_batch", str(rows_per_batch))
        .option("n_splits", str(n_splits))
        .load()
    )
