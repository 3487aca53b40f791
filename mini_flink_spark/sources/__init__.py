"""Sources — bounded (local relation / parquet) and unbounded (rate / file
stream) inputs.

Reference surface: fromElements / fromCollection / addSource
(StreamExecutionEnvironment.java:159,176,187; FromElementsFunction.java:59-90;
StreamSource.java:43). PySpark has no user-defined streaming SourceFunction,
so concrete sources map to built-ins (SURVEY.md §2.1): literal collections ->
createDataFrame; generators -> rate source; external feeds -> file/kafka/socket
streams. For tests, :func:`write_stream_fixture` materializes a bounded
collection as parquet files so a file-stream + AvailableNow trigger replays it
as a terminating stream (EndOfPartitionEvent analogue, SURVEY.md §2.9).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


def from_elements(spark: SparkSession, *elements, schema=None) -> DataFrame:
    from mini_flink_spark.operators.environment import StreamExecutionEnvironment

    return StreamExecutionEnvironment(spark).from_elements(*elements, schema=schema).df


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def write_stream_fixture(
    df: DataFrame, path: str, n_files: int = 4, overwrite: bool = True
) -> str:
    """Materialize a bounded DataFrame as `n_files` parquet files under `path`
    so it can be consumed as a file stream (one microbatch with AvailableNow,
    or several with maxFilesPerTrigger=1)."""
    if overwrite and os.path.exists(path):
        shutil.rmtree(path)
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def parquet_stream(spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a parquet fixture dir.

    Batch-count note: with maxFilesPerTrigger unset, AvailableNow processes
    every existing file in ONE microbatch. Update-mode drains must NOT rely
    on that (one option/default change = stale partial aggregates in the
    sink): pass converge_keys to run_stream_to_memory, which stays correct
    for any batch count (pinned multi-batch in
    tests/test_streaming_converged.py)."""
    reader = spark.readStream.format("parquet").schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
