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


# ---------------------------------------------------------------- Z-order


def _overlapping_files(path, pred_boxes):
    """Count parquet files whose column min/max stats overlap every predicate
    box — the set a stats-based scan planner cannot skip."""
    import glob

    import pyarrow.parquet as pq

    hit = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            stats = {
                g.column(i).path_in_schema: g.column(i).statistics
                for i in range(g.num_columns)
            }
            if all(
                stats[c].min <= hi and stats[c].max >= lo
                for c, (lo, hi) in pred_boxes.items()
            ):
                hit += 1
    return hit, total


def test_zorder_prunes_multidim_boxes(spark, sf_dir, tmp_path):
    from mini_flink_spark.storage import write_zordered

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    z_path, flat_path = str(tmp_path / "z"), str(tmp_path / "flat")
    write_zordered(ev, z_path, ["user_id", "value"], bits=12, num_files=16)
    # baseline: same file count, no clustering (round-robin exchange)
    ev.repartition(16).write.mode("overwrite").parquet(flat_path)

    # sf0.001 events: user_id in [0,14], value in [0,~330] — box covers ~3%
    box = {"user_id": (3, 5), "value": (10.0, 60.0)}
    z_hit, z_total = _overlapping_files(z_path, box)
    f_hit, f_total = _overlapping_files(flat_path, box)
    # every unordered row group overlaps the box; the Z-layout skips most
    assert f_hit == f_total
    assert z_hit <= z_total // 2, (z_hit, z_total)


def test_zorder_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    from mini_flink_spark.storage import write_zordered

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "z2")
    write_zordered(ev, path, ["user_id", "value"], bits=10, num_files=8)
    pred = (F.col("user_id").between(3, 5)) & (F.col("value").between(10.0, 60.0))
    got = sorted(r.event_id for r in spark.read.parquet(path).filter(pred).collect())
    want = sorted(r.event_id for r in ev.filter(pred).collect())
    assert got == want and len(got) > 0


def test_date_partition_pruning(spark, sf_dir, tmp_path):
    from mini_flink_spark.session import read_table
    from mini_flink_spark.storage import write_date_partitioned

    ev = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_date")
    write_date_partitioned(ev, path, "ts")
    back = spark.read.parquet(path)

    one_day = ev.select(F.to_date("ts").alias("d")).distinct().orderBy("d").first().d
    q = back.filter(F.col("event_date") == F.lit(one_day))
    plan = q._jdf.queryExecution().executedPlan().toString()
    # pruning happens at PLANNING: the predicate lands in PartitionFilters
    # (directory-level skip), not PushedFilters (footer/row-group level)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "event_date" in pf[0]
    # and the layout is lossless for the day
    expect = ev.filter(F.to_date("ts") == F.lit(one_day)).count()
    assert q.count() == expect > 0


def test_compact_files_restores_scan_units(spark, tmp_path):
    from mini_flink_spark.storage import compact_files

    src = str(tmp_path / "frag")
    # a fragmented layout: 64 tiny files
    spark.range(100_000).selectExpr("id", "md5(cast(id as string)) as v")\
        .repartition(64).write.parquet(src)
    import glob

    assert len(glob.glob(src + "/*.parquet")) == 64
    dest = compact_files(spark, src, target_file_bytes=10 * 1024 * 1024)
    out_files = glob.glob(dest + "/*.parquet")
    assert len(out_files) < 8  # ~4.5 MB input collapses to a single-digit count
    # content preserved exactly
    a = spark.read.parquet(src)
    b = spark.read.parquet(dest)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_schema_evolution_merge_read(spark, tmp_path):
    # old snapshot lacks the column a later writer added; mergeSchema reads
    # both generations with the union schema, nulls for the missing column
    p = str(tmp_path / "evolve")
    spark.range(5).selectExpr("id", "id * 2 as a").write.parquet(p + "/gen=1")
    spark.range(5, 10).selectExpr("id", "id * 2 as a", "'x' as b").write.parquet(
        p + "/gen=2"
    )
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) >= {"id", "a", "b"}
    assert df.count() == 10
    assert df.filter("b is null").count() == 5
