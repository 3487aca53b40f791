"""Unicode cleanup (strip control chars + NFC): pure-Python reference parity
and the non-vacuity guarantee of the graded query. Oracle parity (DuckDB
nfc_normalize) is auto-covered by test_oracle_parity."""

from __future__ import annotations

import hashlib
import re
import unicodedata

from pyspark.sql import functions as F

from mini_flink_spark.functions import text as T

_CTRL = re.compile(T.CONTROL_CHARS_RE)


def _reference(s: str) -> str:
    return unicodedata.normalize("NFC", _CTRL.sub("", s))


def test_cleanup_matches_python_reference(spark):
    rows = [
        (1, "plain ascii"),
        (2, "combining: e\u0301 u\u0308 a\u030a"),  # -> \xe9 \xfc \xe5 under NFC
        (3, "already composed: \u00e9\u00fc\u00e5"),
        (4, "controls\x00\x07\x1f kept\ttab\nnewline"),
        (5, "hangul: \u1100\u1161\u11a8"),  # jamo -> syllable U+AC01 under NFC
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    out = {
        r.id: r.clean
        for r in df.select(
            "id", T.nfc_normalize(T.strip_control_chars(F.col("s"))).alias("clean")
        ).collect()
    }
    for i, s in rows:
        assert out[i] == _reference(s), (i, out[i].encode(), _reference(s).encode())
    # tab/newline survive (they are real whitespace, not crawl garbage)
    assert "\t" in out[4] and "\n" in out[4] and "\x07" not in out[4]
    # NFC really composed: the decomposed and composed spellings now agree
    assert out[2].split(": ")[1].replace(" ", "") == out[3].split(": ")[1]


def test_graded_query_transforms_every_row(spark, sf_dir):
    """The planted suffix guarantees a non-vacuous pass: every row's bytes
    must shrink (control byte dropped + two combining pairs composed), and
    the md5 must equal the Python reference of the same plant."""
    from mini_flink_spark.queries import QUERIES
    from mini_flink_spark.session import read_table

    out = QUERIES["unicode_normalize_docs"].fn(spark, sf_dir).collect()
    assert len(out) > 0
    assert all(r.raw_bytes - r.clean_bytes == 3 for r in out)  # 1 ctrl + 2 composed
    ref = {
        r.doc_id: hashlib.md5(
            _reference(r.text + " e\u0301u\u0308 x\x07").encode()
        ).hexdigest()[:8]
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    for r in out:
        assert r.clean_md5_8 == ref[r.doc_id], r.doc_id
