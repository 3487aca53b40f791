"""Batch Python DataSource V2 reading a WARC-style web-archive format —
the ingestion path of a web-corpus training pipeline.

Web crawl dumps (Common Crawl et al.) arrive as WARC: concatenated records
of header lines + Content-Length-delimited payload. Spark has no built-in
WARC reader; this implements one through the same Python DataSource V2 API
as the engine's user streaming source (`python_source.py`), batch-shaped:
`partitions()` fans each file out as byte ranges, and every task aligns its
range start to the next record marker — the classic HDFS split-alignment
technique, so tasks read disjoint record sets in parallel with no
coordination.

Simplifications vs real WARC (documented, honest): records are uncompressed
(real crawls are per-record gzip members; a warcio-based body swap keeps the
partitioning), only the three headers the pipeline needs are parsed, and the
record marker is matched textually — a payload embedding a full
"\\r\\n\\r\\nWARC/1.0\\n" sequence would fake a boundary (real WARC marker
scanning shares this caveat; length-driven sequential parse from record 0 is
the airtight-but-serial alternative).

Scale note: byte-range splits mean a 1 TB crawl file reads as ~8k parallel
tasks at 128 MB splits; no driver-side listing beyond file sizes. Python
sources don't get predicate pushdown — filter after the exchange, or
convert to parquet once and let Catalyst prune thereafter (the documented
pattern: WARC is the landing format, not the query format).

Reference parity: extends the `addSource` surface
(StreamExecutionEnvironment.java:187) to batch user sources — the reference
has no batch source API at all (its bounded sources are fromElements/
fromCollection replays, FromElementsFunction.java:59-90).
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

WARC_SOURCE_NAME = "mfs_warc"
_MARKER = b"WARC/1.0\n"
_SEP = b"\r\n\r\n"


def write_warc(path: str, records: list[tuple[str, str, bytes]]) -> None:
    """Write (record_id, uri, payload) triples in the simplified WARC layout.
    Test-fixture helper and the format's executable spec."""
    with open(path, "wb") as f:
        for rid, uri, payload in records:
            f.write(_MARKER)
            f.write(f"WARC-Record-ID: {rid}\n".encode())
            f.write(f"WARC-Target-URI: {uri}\n".encode())
            f.write(f"Content-Length: {len(payload)}\n\n".encode())
            f.write(payload)
            f.write(_SEP)


class _WarcSplit(InputPartition):
    def __init__(self, file: str, start: int, end: int):
        self.file = file
        self.start = start
        self.end = end


def _parse_from(f, end: int):
    """Parse records whose marker lies in [current position, end)."""
    while True:
        pos = f.tell()
        if pos >= end:
            return
        line = f.readline()
        if not line:
            return
        if line != _MARKER:
            # scan forward to the next marker inside the range
            continue
        headers = {}
        while True:
            h = f.readline()
            if h in (b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers.get("content-length", "0"))
        payload = f.read(n)
        f.read(len(_SEP))  # trailing separator
        yield (
            headers.get("warc-record-id", ""),
            headers.get("warc-target-uri", ""),
            n,
            payload.decode("utf-8", "replace"),
        )


class _WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.split_bytes = int(options.get("split_bytes", 128 * 1024 * 1024))

    def _files(self) -> list[str]:
        if os.path.isdir(self.path):
            return sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".warc")
            )
        return [self.path]

    def partitions(self):
        out = []
        for fp in self._files():
            size = os.path.getsize(fp)
            start = 0
            while start < size:
                out.append(_WarcSplit(fp, start, min(start + self.split_bytes, size)))
                start += self.split_bytes
        return out

    def read(self, split: _WarcSplit) -> Iterator[tuple]:
        with open(split.file, "rb") as f:
            # ownership rule: a record belongs to the split containing its
            # marker's first byte; _parse_from line-scans forward from start,
            # so a mid-payload landing simply skips to the next marker
            f.seek(split.start)
            yield from _parse_from(f, split.end)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return WARC_SOURCE_NAME

    def schema(self) -> str:
        return "record_id string, uri string, content_length bigint, payload string"

    def reader(self, schema) -> DataSourceReader:
        return _WarcReader(self.options)


def register_warc_source(spark) -> None:
    spark.dataSource.register(WarcDataSource)
