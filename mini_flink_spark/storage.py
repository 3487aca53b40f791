"""Bucketed-table storage: pre-shuffled layouts for repeat-join workloads.

The reference engine re-partitions every keyed exchange at runtime
(KeyGroupStreamPartitioner.java:45-56 — murmur per record, per job). At
100 TB the equivalent Spark shuffle on a fact⋈fact join is the single most
expensive stage in the plan, and it repeats for every query that joins on
the same key. Bucketing amortizes it: write the table hash-clustered by the
join key once; every subsequent equi-join/aggregation on that key reads the
bucket layout as a satisfied `hashpartitioning` requirement — the plan has
NO Exchange on the bucketed side(s).

Rules that make it work (enforced/encoded here):
- both sides bucketed by the same key into the SAME bucket count
  (`spark.sql.sources.bucketing.enabled` is on by default);
- bucket count chosen so one bucket ≈ 100-500 MB at target scale — at
  100 TB with ~1000 executors, O(8-32k) buckets, never the 32 used in tests;
- `sortBy` the join key within buckets upgrades SMJ to skip the per-task
  sort as well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    num_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a parquet table hash-clustered (and optionally
    intra-bucket sorted) by `keys`. With `path`, the table is external —
    metadata in the catalog, files at `path` (how a lakehouse layout would
    pin table locations)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on `on`: with matching bucket counts the
    planner emits a SortMergeJoin whose children are bare bucketed scans —
    no Exchange, no runtime shuffle (assert via plan_has_no_shuffle)."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def plan_has_no_shuffle(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
