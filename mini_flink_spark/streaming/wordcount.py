"""WordCount — the reference's canonical (and only) end-to-end program.

Reference: WordCount.java:12-35 —
``fromElements("hello world","hello world") -> flatMap(Tokenizer) ->
filter(f0=="hello") -> keyBy(f0) -> reduce(sum) -> print``.

Batch rendering: explode(split) -> filter -> groupBy -> sum, pure Catalyst.
Streaming rendering: the same lineage over a file stream in update output
mode — each trigger emits updated counts for keys seen in that batch, the
microbatch analogue of the reference's per-record running emission
(StreamGroupedReduce.java:40-54); converged counts are identical.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F


def tokenize(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """flatMap(Tokenizer): line -> (word, 1) pairs (WordCount.java Tokenizer).

    Columnar: lower + split on non-alphanumeric runs + explode; empty tokens
    (from leading/trailing separators) are dropped, matching the reference's
    `token.length() > 0` guard.
    """
    return (
        lines.select(
            F.explode(F.split(F.lower(F.col(line_col)), r"\W+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .withColumn("count", F.lit(1))
    )


def wordcount_batch(lines: DataFrame, line_col: str = "line", only_word: str | None = None) -> DataFrame:
    """Full reference pipeline, converged counts."""
    words = tokenize(lines, line_col)
    if only_word is not None:
        words = words.filter(F.col("word") == only_word)
    return words.groupBy("word").agg(F.sum("count").alias("count"))


def wordcount_stream_update(stream_lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Streaming wordcount: update-mode aggregation over an unbounded source."""
    return (
        tokenize(stream_lines, line_col)
        .groupBy("word")
        .agg(F.sum("count").alias("count"))
    )


# lastProgress of the most recent run_stream_to_memory query, keyed by query
# name prefix — lets tests assert *observed* runtime behavior (e.g. that the
# RocksDB state-store provider was actually active, via its rocksdb* custom
# state metrics) rather than just that a conf was set.
LAST_PROGRESS: dict[str, dict] = {}


def run_stream_to_memory(
    result: DataFrame,
    spark: SparkSession,
    output_mode: str = "update",
    query_name: str | None = None,
    state_partitions: int | None = 8,
    state_store: str | None = None,
) -> DataFrame:
    """Run a (bounded) streaming DataFrame to completion with AvailableNow and
    return the memory-sink table as a batch DataFrame.

    AvailableNow drains all currently-available input then stops — the
    bounded-stream termination analogue (EndOfPartitionEvent cascade,
    StreamTaskNetworkInput.java:170).

    ``state_partitions`` sizes the query's state-store layout: each shuffle
    partition owns a state-store instance with per-microbatch snapshot/commit
    and maintenance overhead, so size it to the keyed-state volume, NOT the
    cluster. The tiny local fixtures pay ~1s/instance overhead at 32 (measured
    54s -> 1.4s going 32 -> 4 on streaming wordcount); a production job with
    large keyed state raises it — the value is frozen into the checkpoint at
    first start, which is why it's per-query here and not session-global.
    Pass None to keep the session's current setting.

    ``state_store="rocksdb"`` runs THIS query on the RocksDB state-store
    provider (off-heap working set + SST files on local disk + changelog
    checkpointing — the production configuration for large keyed state; the
    reference's heap-only HeapKeyedStateBackend has no disk path at all).
    The provider class is read from the session conf at query start and
    frozen into the query, so setting+restoring around ``start()`` scopes it
    to this query without flipping the rest of the session.
    """
    name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    restore: dict[str, str | None] = {}
    if state_store == "rocksdb":
        from mini_flink_spark.session import rocksdb_state_conf

        for k, v in rocksdb_state_conf().items():
            try:
                restore[k] = spark.conf.get(k)
            except Exception:  # noqa: BLE001 — unset conf key
                restore[k] = None
            spark.conf.set(k, v)
    elif state_store is not None:
        raise ValueError(f"unknown state_store: {state_store!r}")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        prog = q.lastProgress
        if prog is not None:
            LAST_PROGRESS[name] = prog
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        for k, v in restore.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.table(name)
