"""StreamExecutionEnvironment — the program entry point.

Reference surface (SURVEY.md §2.1): ``fromElements`` / ``fromCollection`` /
``addSource`` on `StreamExecutionEnvironment`
(/root/reference/flink-streaming-java/src/main/java/org/apache/flink/streaming/api/environment/StreamExecutionEnvironment.java:159,176,187).

Spark-first rendering: bounded sources are local relations
(``spark.createDataFrame``), file sources are parquet scans (with pushdown),
and unbounded sources are Structured Streaming ``readStream`` (rate / file).
There is no ``env.execute()`` — Spark's lazy DataFrame lineage replaces the
Transformation DAG, and an action/sink triggers execution (SURVEY.md §3).
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession

from mini_flink_spark.operators.stream import DataStream


class StreamExecutionEnvironment:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    @classmethod
    def get_execution_environment(
        cls, spark: SparkSession | None = None
    ) -> "StreamExecutionEnvironment":
        from mini_flink_spark.session import get_spark

        return cls(spark or get_spark())

    # ------------------------------------------------------------------ sources
    def from_elements(self, *elements: Any, schema: Any = None) -> DataStream:
        """Bounded source from varargs.

        Parity: FromElementsFunction (reference FromElementsFunction.java:59-90)
        pre-serializes and replays elements; Spark's local relation is the same
        idea — a literal table embedded in the plan. Scalars are wrapped into a
        single column named ``value`` (matching the reference's single-field
        record model for non-tuple types).
        """
        return self.from_collection(list(elements), schema=schema)

    def from_collection(self, collection: Iterable[Any], schema: Any = None) -> DataStream:
        data = list(collection)
        if data and not isinstance(data[0], (tuple, list, dict)):
            # Scalar stream -> single column `value`, mirroring the reference's
            # single-field record model for non-tuple types.
            if schema is None:
                spark_t = {str: "string", bool: "boolean", int: "bigint", float: "double"}
                t = spark_t.get(type(data[0]))
                if t is None:
                    raise TypeError(f"unsupported scalar element type: {type(data[0])}")
                schema = f"value {t}"
            data = [(x,) for x in data]
        return DataStream(self.spark.createDataFrame(data, schema))

    def read_csv(self, path: str, schema: Any = None, header: bool = True) -> DataStream:
        reader = self.spark.read.option("header", str(header).lower())
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        return DataStream(reader.csv(path))

    def read_json(self, path: str, schema: Any = None) -> DataStream:
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return DataStream(reader.json(path))

    def socket_stream(self, host: str = "localhost", port: int = 9999) -> DataStream:
        """Unbounded line stream from a TCP socket (single `value` column —
        the shape of the reference's socketTextStream upstream cousin)."""
        return DataStream(
            self.spark.readStream.format("socket")
            .option("host", host)
            .option("port", str(port))
            .load()
        )

    def read_parquet(self, path: str) -> DataStream:
        """File source; filters/projections applied downstream are pushed into
        the scan by Catalyst (checked in tests/test_plans.py)."""
        return DataStream(self.spark.read.parquet(path))

    def read_orc(self, path: str, schema: Any = None) -> DataStream:
        """ORC file source — same vectorized reader + filter pushdown class
        as parquet (both are columnar DataSource V2 scans)."""
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return DataStream(reader.orc(path))

    def read_text(self, path: str) -> DataStream:
        """Line-oriented text source (single `value` column) — the batch shape
        of the reference's per-line socket/file text streams."""
        return DataStream(self.spark.read.text(path))

    def from_table(self, name: str) -> DataStream:
        return DataStream(self.spark.table(name))

    # streaming sources ------------------------------------------------------
    def rate_source(self, rows_per_second: int = 100) -> DataStream:
        """Unbounded source — Spark's rate source (addSource analogue for an
        infinite generator; reference StreamSource.java:43 runs a user loop)."""
        df = (
            self.spark.readStream.format("rate")
            .option("rowsPerSecond", str(rows_per_second))
            .load()
        )
        return DataStream(df)

    def add_source(
        self, elements: list[str], rows_per_batch: int = 0, n_splits: int = 2
    ) -> DataStream:
        """User-defined streaming source under engine control — the
        ``addSource(new SourceFunction(){run/cancel})`` analogue
        (StreamExecutionEnvironment.java:187; StreamSource.java:43,59-100),
        implemented as a Python DataSource V2 stream reader
        (sources/python_source.py): the engine pulls offsets and partitions,
        the source decides the rows; drained length = run() returning."""
        from mini_flink_spark.sources.python_source import elements_stream

        return DataStream(
            elements_stream(self.spark, elements, rows_per_batch, n_splits)
        )

    def file_stream(self, path: str, schema: Any, fmt: str = "parquet") -> DataStream:
        """Unbounded file-discovery source over a directory/glob.

        The idiomatic replacement for the reference's SourceFunction thread:
        new files are discovered per microbatch; with ``Trigger.AvailableNow``
        a bounded run drains existing files then stops (SURVEY.md §2.9
        bounded-stream termination ≈ EndOfPartitionEvent cascade).
        """
        reader = self.spark.readStream.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        return DataStream(reader.load(path))

    # ------------------------------------------------------------------- SQL
    def register_table(self, name: str, stream: "DataStream | DataFrame") -> None:
        """Expose a stream as a named view for env.sql() — the Table-API
        bridge the reference never had (SURVEY.md §2.6: no SQL surface;
        Spark gives it natively)."""
        df = stream.df if isinstance(stream, DataStream) else stream
        df.createOrReplaceTempView(name)

    def sql(self, query: str) -> DataStream:
        """Run ANSI SQL over registered tables, returning a DataStream (full
        Catalyst planning — the same engine path as the fluent API)."""
        return DataStream(self.spark.sql(query))

    # ----------------------------------------------------------- accumulators
    def int_counter(self, initial: int = 0):
        """Distributed counter — parity with the reference's accumulator
        surface (RuntimeContext + IntCounter, fc:api/common/accumulators/;
        SURVEY.md §2.7). Updated from UDF/foreach code on executors, read on
        the driver with ``.value`` after an action."""
        return self.spark.sparkContext.accumulator(initial)

    def execute(self, job_name: str = "job") -> None:
        """No-op kept for API familiarity: Spark executes on sink/action."""
        return None
