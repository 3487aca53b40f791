"""Bucketed-table layout: the pre-shuffled join path (storage.py).

Pins the property the module exists for: a join of two tables bucketed on
the join key runs with ZERO Exchange operators — the shuffle happened once
at write time, not per query."""

import tempfile

import pytest
from pyspark.sql import functions as F

from mini_flink_spark.session import read_table
from mini_flink_spark.storage import co_located_join, plan_has_no_shuffle, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="bucketed_")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "orders_b", "o_orderkey", 8, path=f"{base}/orders_b")
    write_bucketed(l, "lineitem_b", "o_orderkey", 8, path=f"{base}/lineitem_b")
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, lt, rt, "o_orderkey")
        assert plan_has_no_shuffle(joined)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        co_located_join(spark, lt, rt, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    want = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_agg_skips_exchange(spark, bucketed_tables):
    # aggregation on the bucket key also satisfies its distribution
    # requirement from the layout — no shuffle before the final agg
    _, rt = bucketed_tables
    agg = spark.table(rt).groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
