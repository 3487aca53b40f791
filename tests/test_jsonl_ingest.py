"""JSONL ingestion: the LLM-corpus interchange format through Spark's native
json reader. The graded roundtrip lives in queries_ext.q_jsonl_ingest_roundtrip
(oracle-paired); these tests pin what the hash alone doesn't state — the
malformed-line policies and the no-inference-scan contract.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

SCHEMA = "doc_id bigint, text string"


def _fixture(spark, tmp: str) -> str:
    """Three valid JSONL lines + two malformed ones (truncated object, bare
    garbage), written as a plain text file the way a broken upstream shard
    arrives."""
    path = os.path.join(tmp, "shard.jsonl")
    lines = [
        '{"doc_id": 1, "text": "alpha"}',
        '{"doc_id": 2, "text": "line with \\n escape"}',
        "{\"doc_id\": 3, \"text\": ",  # truncated mid-object
        "not json at all",
        '{"doc_id": 4, "text": "delta"}',
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def test_permissive_quarantines_corrupt_lines(spark):
    """Corpus-scale policy: PERMISSIVE + columnNameOfCorruptRecord keeps the
    pipeline running and routes broken lines to a quarantine column instead
    of silently dropping them (silent drops misreport corpus size)."""
    with tempfile.TemporaryDirectory(prefix="jsonl_t_") as tmp:
        path = _fixture(spark, tmp)
        df = (
            spark.read.schema(SCHEMA + ", _corrupt string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .json(path)
        )
        rows = df.collect()
        good = sorted(r.doc_id for r in rows if r._corrupt is None)
        bad = [r._corrupt for r in rows if r._corrupt is not None]
        assert good == [1, 2, 4]
        assert len(bad) == 2 and "not json at all" in bad
        # the escaped newline survived as a real newline in the value
        assert any("\n" in (r.text or "") for r in rows)


def test_failfast_raises_on_corrupt_line(spark):
    """CI policy: FAILFAST turns a malformed shard into a loud error."""
    with tempfile.TemporaryDirectory(prefix="jsonl_t_") as tmp:
        path = _fixture(spark, tmp)
        df = spark.read.schema(SCHEMA).option("mode", "FAILFAST").json(path)
        with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
            df.collect()


def test_dropmalformed_keeps_only_valid(spark):
    with tempfile.TemporaryDirectory(prefix="jsonl_t_") as tmp:
        path = _fixture(spark, tmp)
        df = spark.read.schema(SCHEMA).option("mode", "DROPMALFORMED").json(path)
        assert sorted(r.doc_id for r in df.collect()) == [1, 2, 4]


def test_explicit_schema_skips_inference_scan(spark):
    """The 100 TB contract: with an explicit schema the reader plans ZERO
    jobs before the real scan (inference is a full extra pass). Pinned by
    asserting plan construction triggers no Spark jobs."""
    with tempfile.TemporaryDirectory(prefix="jsonl_t_") as tmp:
        path = _fixture(spark, tmp)
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup(None) or [])
        df = spark.read.schema(SCHEMA).json(path)  # no action
        _ = df.schema
        after = len(tracker.getJobIdsForGroup(None) or [])
        assert after == before, "explicit-schema json read ran a job pre-action"


def test_roundtrip_query_matches_input(spark, sf_dir):
    from mini_flink_spark.queries import QUERIES
    from mini_flink_spark.session import read_table

    out = QUERIES["jsonl_ingest_roundtrip"].fn(spark, sf_dir)
    got = {(r.doc_id, r.lang, r.source, r.text_bytes) for r in out.collect()}
    want = {
        (r.doc_id, r.lang, r.source, r.text_bytes)
        for r in read_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            "source",
            F.octet_length("text").cast("bigint").alias("text_bytes"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
