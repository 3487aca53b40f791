"""Edge semantics of the temporal join operators (operators/asof.py):
boundary inclusion, tie-breaking, null on no-match, bucket-crossing matches,
and no duplicate pairs from the 2-bucket explode."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mini_flink_spark.operators.asof import asof_join, interval_join


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01 10:00:00")),  # exact-ts right match
            (2, 10, ts("2024-01-01 10:30:00")),  # later right wins
            (3, 10, ts("2024-01-01 09:00:00")),  # before any right -> null
            (4, 20, ts("2024-01-01 12:00:00")),  # tie on right ts -> max id
        ],
        "lid int, k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, ts("2024-01-01 10:00:00")),
            (101, 10, ts("2024-01-01 10:15:00")),
            (200, 20, ts("2024-01-01 11:00:00")),
            (201, 20, ts("2024-01-01 11:00:00")),
        ],
        "rid int, k int, rts timestamp",
    )
    return left, right


def test_asof_semantics(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=["rid"], tiebreak="rid",
    )
    got = {r.lid: r.rid_asof for r in out.collect()}
    assert got == {
        1: 100,   # right at exactly left ts counts as prior
        2: 101,   # latest prior wins
        3: None,  # nothing at or before
        4: 201,   # equal rts -> greatest tiebreak wins
    }


def test_asof_preserves_left_rowcount(spark, sides):
    left, right = sides
    out = asof_join(left, right, "k", "lts", "rts", ["rid"], tiebreak="rid")
    assert out.count() == left.count()


def test_interval_join_boundaries_and_buckets(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 10:00:00"))], "lid int, k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 1, ts("2024-01-01 10:00:00")),  # lower bound: included
            (11, 1, ts("2024-01-01 10:30:00")),  # upper bound: included
            (12, 1, ts("2024-01-01 10:30:01")),  # past upper: excluded
            (13, 1, ts("2024-01-01 09:59:59")),  # before lower: excluded
            (14, 2, ts("2024-01-01 10:10:00")),  # wrong key: excluded
        ],
        "rid int, k int, rts timestamp",
    )
    out = interval_join(left, right, "k", "lts", "rts", lower_s=0, upper_s=1800)
    assert sorted(r.rid for r in out.collect()) == [10, 11]


def test_interval_join_no_duplicate_pairs(spark):
    # rights sit in both adjacent buckets relative to the left window
    left = spark.createDataFrame(
        [(i, 1, ts(f"2024-01-01 10:{i:02d}:00")) for i in range(20)],
        "lid int, k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(100 + i, 1, ts(f"2024-01-01 10:{i:02d}:30")) for i in range(20)],
        "rid int, k int, rts timestamp",
    )
    out = interval_join(left, right, "k", "lts", "rts", lower_s=0, upper_s=120)
    pairs = [(r.lid, r.rid) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    # spot-check: left 0 matches rights at 00:30, 01:30 (within 120s)
    assert sorted(r for l, r in pairs if l == 0) == [100, 101]


def test_interval_join_negative_lower(spark):
    # window reaching backwards: purchase within 10 min BEFORE the click too
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01 10:00:00"))], "lid int, k int, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 1, ts("2024-01-01 09:55:00")),
            (11, 1, ts("2024-01-01 10:05:00")),
            (12, 1, ts("2024-01-01 09:49:00")),
        ],
        "rid int, k int, rts timestamp",
    )
    out = interval_join(left, right, "k", "lts", "rts", lower_s=-600, upper_s=600)
    assert sorted(r.rid for r in out.collect()) == [10, 11]
