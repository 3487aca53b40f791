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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


# ---------------------------------------------------------------- Z-order

def zorder_key(
    scaled: list[Column], bits: int = 12
) -> Column:
    """Interleave the low `bits` bits of pre-scaled non-negative ints into one
    Morton (Z-order) key: bit j of column i lands at position j*ncols + i.

    Built as a flat sum of shift/mask terms — one codegen'd expression, no UDF.
    12 bits x 2 cols = 24 terms; the resulting 24-bit key orders rows along a
    space-filling curve so parquet row-group min/max stats become tight boxes
    in BOTH dimensions (a single-column sort gives tight stats in one).
    """
    n = len(scaled)
    if bits * n > 63:
        # Spark's shiftleft is Java's <<, which masks the shift mod 64 — a
        # wrapped bit position would silently destroy the curve property
        raise ValueError(
            f"zorder_key: bits*ncols = {bits * n} exceeds the 63 usable bits "
            f"of a signed bigint; lower bits or cluster fewer columns"
        )
    terms = []
    for j in range(bits):
        for i, c in enumerate(scaled):
            terms.append(
                F.shiftleft(F.shiftright(c, j).bitwiseAND(F.lit(1)), j * n + i)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def scale_to_bits(c: Column, cmin: Column, cmax: Column, bits: int = 12) -> Column:
    """Min-max scale a numeric column to [0, 2^bits) as bigint (clamped;
    constant columns collapse to 0). Bounds come from a one-pass agg at write
    time — at 100 TB that scan is amortized into the write job itself."""
    top = (1 << bits) - 1
    span = (cmax - cmin).cast("double")
    frac = F.when(span > 0, (c.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(
        F.lit(top).cast("bigint"),
        F.greatest(F.lit(0).cast("bigint"), F.floor(frac * top).cast("bigint")),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet clustered along the Z-order curve of `cols`.

    The point at 100 TB: multi-dimensional predicate pruning WITHOUT paying a
    partition column per dimension. Range-partition + intra-file sort by the
    Morton key makes every file/row-group a tight min/max box over ALL of
    `cols`, so a conjunctive range predicate skips most files at scan planning
    (parquet footer stats), not at execution. A plain sort by one column only
    prunes that column; Hive-style partitioning by two high-cardinality
    columns explodes the file count. `num_files` sizes files — target
    ~128-512 MB each at scale, never the test-scale 16.

    One extra scan (min/max agg) + one range exchange — both amortized into
    the write job, exactly like `write_bucketed`'s one-time shuffle.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        scale_to_bits(
            F.col(c),
            F.lit(bounds[f"__min_{c}"]),
            F.lit(bounds[f"__max_{c}"]),
            bits,
        )
        for c in cols
    ]
    z = df.withColumn("__z", zorder_key(scaled, bits))
    (
        z.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    part_col: str = "event_date",
    mode: str = "overwrite",
) -> str:
    """Hive-style date-partitioned parquet layout: one directory per day.

    The third storage lever next to bucketing (join-key co-location) and
    Z-order (multi-dim stats pruning): a time predicate prunes whole
    PARTITION DIRECTORIES at planning time — `PartitionFilters` in the scan —
    so a day query over a 100 TB / 3-year corpus lists and reads ~0.1% of
    files without touching any footer. Time is the near-universal first
    filter on event data (the reference's whole domain), which makes
    date the default outermost partition key; avoid over-partitioning
    (sub-day keys multiply tiny files — keep >= 100 MB per partition-file).
    """
    (
        df.withColumn(part_col, F.to_date(F.col(ts_col)))
        .write.partitionBy(part_col)
        .mode(mode)
        .parquet(path)
    )
    return path


def compact_files(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    out_path: str | None = None,
) -> str:
    """Small-file compaction: rewrite a parquet directory into files sized
    near `target_file_bytes`. The fourth storage lever — streaming sinks and
    fine-grained partitioned writes accrete KB-scale files, and at 100 TB
    the resulting open/footer/seek overhead (plus NameNode/listing pressure)
    dominates scan cost long before data volume does; periodic compaction
    restores ~128-256 MB scan units.

    File count = ceil(input_bytes / target): measured from the source files
    themselves (no data pass), then one round-robin repartition — the
    rewrite is a single shuffle-light job, safe to run concurrently with
    readers of the OLD path (write lands in `out_path`, or `path + "_compact"`;
    atomically swap directories outside this function).

    Input bytes come from the Hadoop FileSystem API over the DataFrame's own
    `inputFiles()` (ADVICE r3: the previous os.walk sizing returned 0 for any
    non-local path — hdfs://, s3a:// — silently compacting the whole dataset
    into ONE file; FileSystem.getFileStatus resolves through whatever
    filesystem the path actually lives on)."""
    import math

    df = spark.read.parquet(path)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(hconf).getFileStatus(p).getLen()
    if total == 0:
        raise ValueError(
            f"compact_files: could not size any input under {path!r} — "
            "refusing to guess a file count"
        )
    n_files = max(1, math.ceil(total / target_file_bytes))
    dest = out_path or path.rstrip("/") + "_compact"
    df.repartition(n_files).write.mode("overwrite").parquet(dest)
    return dest
