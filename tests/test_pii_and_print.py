"""PII redaction (functions/text.py) and the parallel print sink's prefix
contract (PrintSinkOutputWriter.java:54-74)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mini_flink_spark.functions.text import PII_PATTERNS, pii_count, redact_pii
from mini_flink_spark.operators.stream import DataStream, format_record, print_prefix


def test_redaction_on_planted_pii(spark):
    rows = [
        (1, "reach me at jane.doe+x@example.co.uk or 192.168.0.1"),
        (2, "call +44 20 7946 0958 today"),
        (3, "no pii here at all"),
        (4, "a@b.io and 10.0.0.7 and +1 555-123-4567"),
    ]
    df = spark.createDataFrame(rows, "id bigint, txt string")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii("txt").alias("clean"),
            pii_count("txt", "email").alias("ne"),
            pii_count("txt", "ipv4").alias("ni"),
            pii_count("txt", "phone").alias("np"),
        ).collect()
    }
    assert out[1]["clean"] == "reach me at [EMAIL] or [IP]"
    assert (out[1]["ne"], out[1]["ni"], out[1]["np"]) == (1, 1, 0)
    assert out[2]["clean"] == "call [PHONE] today"
    assert out[3]["clean"] == "no pii here at all"
    assert out[4]["clean"] == "[EMAIL] and [IP] and [PHONE]"
    assert (out[4]["ne"], out[4]["ni"], out[4]["np"]) == (1, 1, 1)


def test_patterns_are_re2_compatible():
    """The oracle runs the same patterns under DuckDB's RE2 — keep them in the
    common subset (no lookarounds/backrefs, which RE2 rejects)."""
    for pattern, _ in PII_PATTERNS.values():
        assert "(?<" not in pattern and "(?=" not in pattern and "\\1" not in pattern


def test_print_prefix_matches_reference_contract():
    # PrintSinkOutputWriter.open: parallelism 1 -> no subtask index;
    # >1 -> [id][:]<subtask+1>; "> " appended only when non-empty
    assert print_prefix("", 0, 1) == ""
    assert print_prefix("", 0, 2) == "1> "
    assert print_prefix("", 3, 4) == "4> "
    assert print_prefix("sink", 0, 1) == "sink> "
    assert print_prefix("sink", 2, 4) == "sink:3> "


def test_format_record_tuple_style():
    assert format_record(("hello", 2)) == "(hello,2)"
    assert format_record(("solo",)) == "solo"


def test_parallel_print_runs(spark):
    # smoke: executor-side print job completes without collecting
    ds = DataStream(spark.range(10).withColumn("v", F.lit("x")))
    assert ds.print(parallel=True) is None
