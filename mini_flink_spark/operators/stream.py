"""DataStream / KeyedStream — the reference's fluent API, DataFrame-backed.

Reference surface (SURVEY.md §2.2-2.5):
  map      -> DataStream.java:136-146 / StreamMap.java:40-43
  flatMap  -> DataStream.java:148-158 / StreamFlatMap.java:48-52
  filter   -> DataStream.java:160-162 / StreamFilter.java:38-42
  keyBy    -> DataStream.java:131-134 / KeyGroupStreamPartitioner.java:45-56
  reduce   -> KeyedStream.java:206-209 / StreamGroupedReduce.java:35-56
  print    -> DataStream.java:181-184 / PrintSinkFunction.java:80-82
  addSink  -> DataStream.java:227-243 / StreamSink.java:54-58
  rebalance/shuffle partitioners -> RebalancePartitioner.java:35-45,
  ShufflePartitioner.java:33-36

Design stance: every operator has a *columnar fast path* (pure Catalyst
expressions, whole-stage codegen, no Python in the loop) and a *callable slow
path* (Arrow-batched pandas execution via mapInPandas) for opaque logic — the
analogue of the reference's arbitrary Java lambdas. At 100 TB you use the fast
path; the slow path exists for parity with the reference's opaque-UDF surface.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

ColumnsOrFn = Any

ARRIVAL_COL = "__arrival__"


def _as_columns(exprs: Sequence[Any]) -> list[Column]:
    return [F.expr(e) if isinstance(e, str) else e for e in exprs]


def print_prefix(sink_identifier: str, subtask_index: int, num_subtasks: int) -> str:
    """The reference's completed prefix (PrintSinkOutputWriter.java:54-69):
    ``[id][:]<subtask+1>`` when parallel, then ``"> "`` if non-empty."""
    prefix = sink_identifier
    if num_subtasks > 1:
        if prefix:
            prefix += ":"
        prefix += str(subtask_index + 1)
    if prefix:
        prefix += "> "
    return prefix


def format_record(values: tuple) -> str:
    """Record rendering for the parallel print sink: bare value for 1-column
    rows, Flink-Tuple-style ``(a,b)`` otherwise (Tuple2.toString)."""
    if len(values) == 1:
        return str(values[0])
    return "(" + ",".join(str(v) for v in values) + ")"


class DataStream:
    """Thin handle over a (possibly streaming) DataFrame — the analogue of the
    reference's DataStream-over-Transformation lazy DAG (DataStream.java:54-58):
    nothing executes until a sink/action."""

    def __init__(self, df: DataFrame):
        self.df = df

    # ------------------------------------------------------------- transforms
    def map(self, *exprs: ColumnsOrFn, fn: Callable | None = None, schema: Any = None) -> "DataStream":
        """1→1 transform (StreamMap.java:40-43).

        Fast path: ``map("a+b as s", F.col("x"))`` — a Catalyst projection.
        Slow path: ``map(fn=lambda pdf: ..., schema=...)`` — `fn` receives and
        returns pandas DataFrames (Arrow batches), the vectorized rendering of
        the reference's per-record MapFunction.map.
        """
        if fn is not None:
            return DataStream(self.df.mapInPandas(lambda it: (fn(pdf) for pdf in it), schema))
        return DataStream(self.df.select(*_as_columns(exprs)))

    def with_column(self, name: str, expr: Any) -> "DataStream":
        return DataStream(self.df.withColumn(name, F.expr(expr) if isinstance(expr, str) else expr))

    def flat_map(self, *exprs: ColumnsOrFn, fn: Callable | None = None, schema: Any = None) -> "DataStream":
        """1→N transform (StreamFlatMap.java:48-52).

        Fast path: pass a projection where one element is an
        ``explode(array_expr)`` — e.g. tokenization via
        ``explode(split(line, ' '))``. Slow path: `fn` maps a pandas DataFrame
        to a pandas DataFrame with any number of rows (0..N per input row).
        """
        if fn is not None:
            return DataStream(self.df.mapInPandas(lambda it: (fn(pdf) for pdf in it), schema))
        return DataStream(self.df.select(*_as_columns(exprs)))

    def filter(self, predicate: Any = None, fn: Callable | None = None) -> "DataStream":
        """Drop records failing the predicate (StreamFilter.java:38-42).

        Fast path: SQL/Column predicate — pushed into the parquet scan by
        Catalyst when possible. Slow path: `fn` is a pandas Series -> bool
        Series callable, run as a vectorized pandas UDF.
        """
        if fn is not None:
            from pyspark.sql.functions import pandas_udf

            cols = self.df.columns
            mask = pandas_udf(fn, "boolean")
            return DataStream(self.df.filter(mask(*[F.col(c) for c in cols])))
        return DataStream(self.df.filter(predicate))

    # ----------------------------------------------------------- partitioning
    def key_by(self, *keys: Any) -> "KeyedStream":
        """Logical hash partitioning by key (KeyGroupStreamPartitioner.java:45-56).

        We do not reproduce the reference's murmur→128-key-group numerology
        (KeyGroupRangeAssignment.java:48-74); Spark's HashPartitioner inside
        groupBy/repartition provides the same contract — all records of a key
        meet in one task (SURVEY.md §1.3).
        """
        return KeyedStream(self.df, _as_columns(keys))

    def assign_timestamps_and_watermarks(
        self, ts_col: str, max_out_of_orderness: str = "0 seconds"
    ) -> "DataStream":
        """Bounded-out-of-orderness event-time watermark.

        The live rendering of the reference's dead watermark machinery
        (SURVEY.md §2.8: Watermark.java:42-50 exists but the surviving
        NonTimestampContext never emits one — StreamSourceContexts.java:41-52).
        Spark's global watermark is min-across-partitions, the same alignment
        rule as the reference's StatusWatermarkValve.java:86-142.

        Streaming: `withWatermark` — windows stay open (and state is kept) at
        least until watermark = max(event_ts) - delay passes their end; rows
        arriving after that are dropped once the advanced watermark has
        propagated (Spark filters late events against the *previous* batch's
        watermark, so the contract is "at least this long", not "exactly
        then"). Batch: identity (a bounded input is complete, watermark =
        +inf — the MAX_WATERMARK emitted at end-of-stream, Watermark.java:45).
        """
        if self.df.isStreaming:
            return DataStream(self.df.withWatermark(ts_col, max_out_of_orderness))
        return self

    def rebalance(self, n: int | None = None) -> "DataStream":
        """Round-robin redistribution (RebalancePartitioner.java:35-45)."""
        return DataStream(self.df.repartition(n) if n else self.df.repartition(self.df.rdd.getNumPartitions()))

    def shuffle(self, n: int | None = None) -> "DataStream":
        """Uniform-random redistribution (ShufflePartitioner.java:33-36);
        Spark's round-robin repartition is the same distributional contract."""
        return self.rebalance(n)

    # -------------------------------------------------------------- set ops
    def distinct(self) -> "DataStream":
        return DataStream(self.df.distinct())

    def drop_duplicates(self, subset: Sequence[str] | None = None) -> "DataStream":
        """Exact dedup on a column subset (content-hash dedup for documents
        lives in functions.dedup.exact_dedup)."""
        return DataStream(self.df.dropDuplicates(list(subset) if subset else None))

    def join(self, other: "DataStream", on: Any, how: str = "inner",
             broadcast_other: bool = False) -> "DataStream":
        """Relational join (absent in the reference — SURVEY.md §2.6; native
        here). `broadcast_other` hints the dim-table pattern explicitly;
        otherwise AQE picks the strategy."""
        right = F.broadcast(other.df) if broadcast_other else other.df
        return DataStream(self.df.join(right, on, how))

    def union(self, *others: "DataStream") -> "DataStream":
        out = self.df
        for o in others:
            out = out.unionByName(o.df)
        return DataStream(out)

    # ----------------------------------------------------------------- sinks
    def print(self, n: int = 20, truncate: bool = False, parallel: bool = False,
              sink_identifier: str = ""):
        """print() sink (PrintSinkFunction.java:80-82).

        Default renders a table via show() (the readable local form).
        ``parallel=True`` reproduces the reference's exact console contract
        (PrintSinkOutputWriter.java:54-74): each subtask prints its own
        records line-by-line, prefixed ``[id][:]<subtask+1>> `` only when
        parallelism > 1 — rows print executor-side, nothing is collected."""
        if self.df.isStreaming:
            return self.df.writeStream.format("console").outputMode("update").start()
        if parallel:
            rdd = self.df.rdd
            n_parts = rdd.getNumPartitions()

            def _print_partition(idx, rows):
                prefix = print_prefix(sink_identifier, idx, n_parts)
                for row in rows:
                    print(prefix + format_record(tuple(row)))
                return iter(())

            rdd.mapPartitionsWithIndex(_print_partition).count()
            return None
        self.df.show(n, truncate=truncate)
        return None

    def add_sink(self, fn: Callable[[DataFrame, int], None], output_mode: str = "update"):
        """User sink (StreamSink.java:54-58): batch -> fn(df, 0); stream ->
        foreachBatch(fn)."""
        if self.df.isStreaming:
            return self.df.writeStream.outputMode(output_mode).foreachBatch(fn).start()
        fn(self.df, 0)
        return None

    def write_jsonl_sink(self, path: str, output_mode: str = "append",
                         checkpoint: str | None = None):
        """Engine-controlled user sink via Python DataSource V2
        (sources/python_sink.py): tasks stage+publish write-once JSONL files,
        the driver commits a per-batch manifest — addSink with the two-phase
        commit contract the reference's SinkFunction lacked."""
        from mini_flink_spark.sources.python_sink import SINK_NAME, register_jsonl_sink

        register_jsonl_sink(self.df.sparkSession)
        if self.df.isStreaming:
            w = (
                self.df.writeStream.format(SINK_NAME)
                .option("path", path)
                .outputMode(output_mode)
                .trigger(availableNow=True)
            )
            if checkpoint is not None:
                w = w.option("checkpointLocation", checkpoint)
            q = w.start()
            q.awaitTermination(300)
            return q
        self.df.write.format(SINK_NAME).option("path", path).mode("append").save()
        return None

    def write_parquet(self, path: str, mode: str = "overwrite", partition_by: Sequence[str] = ()):
        w = self.df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    # ------------------------------------------------------------------ misc
    def write_csv(self, path: str, mode: str = "overwrite", header: bool = True):
        self.df.write.mode(mode).option("header", str(header).lower()).csv(path)

    def write_json(self, path: str, mode: str = "overwrite"):
        self.df.write.mode(mode).json(path)

    def write_orc(self, path: str, mode: str = "overwrite", partition_by: Sequence[str] = ()):
        """ORC sink — the other columnar format Spark ships natively; same
        pushdown/pruning behavior as parquet at scale."""
        w = self.df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.orc(path)

    def with_arrival_index(self, order_col: str | None = None) -> "DataStream":
        """Attach an arrival-order column.

        The reference's per-key semantics are arrival-ordered (single-threaded
        per-key processing, StreamGroupedReduce.java:35-56); Spark is
        set-oriented, so order-sensitive operators (running reduce, min_by/
        max_by 'first' tie-break) need an explicit order column. If the data
        already has one (event_id, a file offset), pass it; otherwise a
        monotonically-increasing id is attached (unique, partition-ordered —
        sufficient for deterministic tie-breaking, not global arrival order).
        """
        if order_col is not None:
            return DataStream(self.df.withColumn(ARRIVAL_COL, F.col(order_col)))
        return DataStream(self.df.withColumn(ARRIVAL_COL, F.monotonically_increasing_id()))

    def map_partitions(
        self, fn: Callable, schema: Any, open_fn: Callable | None = None
    ) -> "DataStream":
        """Per-partition imperative escape hatch (the reference's `transform`
        on one-input operators, DataStream.java:187-216) with RichFunction
        lifecycle parity (RichFunction.open/close,
        AbstractRichFunction — SURVEY.md §2.7):

        - `open_fn()` runs once per task before the first batch (open());
          its return value is passed to every `fn(pdf, ctx)` call — the slot
          for loading a model, a dictionary, a connection.
        - `fn(pdf, ctx)` receives each Arrow batch as a pandas DataFrame and
          yields 0..N output rows (returns a pandas DataFrame).

        Arrow-batched (mapInPandas) — never row-at-a-time Python.
        """

        def gen(it):
            ctx = open_fn() if open_fn is not None else None
            for pdf in it:
                out = fn(pdf, ctx) if open_fn is not None else fn(pdf)
                if out is not None:
                    yield out

        return DataStream(self.df.mapInPandas(gen, schema))

    def to_df(self) -> DataFrame:
        return self.df

    def collect(self):
        return self.df.collect()

    def explain(self, mode: str = "formatted"):
        return self.df.explain(mode=mode)


class KeyedStream(DataStream):
    """Keyed view of a stream (KeyedStream.java:42). Aggregations over it are
    the analogue of keyed ValueState reduce (StreamGroupedReduce.java:35-56),
    rendered as groupBy — Spark's partial (map-side) aggregation gives the
    combiner the reference never had (every reference record crossed the
    shuffle; SURVEY.md §2.4)."""

    def __init__(self, df: DataFrame, keys: list[Column]):
        super().__init__(df)
        self.keys = keys

    def reduce(self, *aggs: Any, fn: Callable | None = None, value_cols: Sequence[str] | None = None,
               order_col: str | None = None, schema: Any = None) -> DataStream:
        """Converged per-key reduce.

        The reference's reduce emits one output per *input* record (running
        state); its converged value per key is what a batch reduce returns.
        For the per-record emission semantics use
        :mod:`mini_flink_spark.operators.running_reduce`.

        Fast path: ``reduce(F.sum("v").alias("s"), ...)`` — Catalyst aggregate
        with map-side partials. Slow path: `fn` is a binary ``(acc_row, row) ->
        acc_row`` Python callable folded left in `order_col` order per key via
        applyInPandas (exact parity with arbitrary ReduceFunction lambdas).
        """
        if fn is None:
            return DataStream(self.df.groupBy(*self.keys).agg(*_as_columns(aggs)))

        import pandas as pd

        value_cols = list(value_cols or self.df.columns)
        out_schema = schema or self.df.select(*value_cols).schema

        def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
            if order_col is not None:
                pdf = pdf.sort_values(order_col, kind="mergesort")
            rows = pdf[value_cols].to_dict("records")
            acc = rows[0]
            for r in rows[1:]:
                acc = fn(acc, r)
            return pd.DataFrame([acc])

        return DataStream(self.df.groupBy(*self.keys).applyInPandas(fold, out_schema))

    # pre-built aggregators (SumAggregator.java:33-72, ComparableAggregator.java:31-93)
    def sum(self, field: str, alias: str | None = None) -> DataStream:
        return self.reduce(F.sum(field).alias(alias or f"sum_{field}"))

    def min(self, field: str, alias: str | None = None) -> DataStream:
        return self.reduce(F.min(field).alias(alias or f"min_{field}"))

    def max(self, field: str, alias: str | None = None) -> DataStream:
        return self.reduce(F.max(field).alias(alias or f"max_{field}"))

    def min_by(self, field: str, order_col: str, first: bool = True) -> DataStream:
        from mini_flink_spark.operators.aggregations import min_by_record

        return DataStream(min_by_record(self.df, self.keys, field, order_col, first=first))

    def max_by(self, field: str, order_col: str, first: bool = True) -> DataStream:
        from mini_flink_spark.operators.aggregations import max_by_record

        return DataStream(max_by_record(self.df, self.keys, field, order_col, first=first))

    def count(self, alias: str = "count") -> DataStream:
        return self.reduce(F.count(F.lit(1)).alias(alias))

    def process(
        self,
        fn: Callable,
        output_schema: Any,
        state_schema: Any = None,
        output_mode: str = "append",
        timeout: str = "NoTimeout",
    ) -> DataStream:
        """Generic keyed process function — the live rendering of the
        reference's dead ProcessFunction/KeyedProcessFunction surface
        (ProcessFunction.java / KeyedProcessFunction.java, unreachable per
        SURVEY.md §2.7) and of the `transform` escape hatch on keyed streams.

        Streaming input: `fn(key, pdf_iter, state)` runs under
        applyInPandasWithState — per-key ValueState (`state.get/update/
        remove`), optional timers via `timeout` ('EventTimeTimeout' /
        'ProcessingTimeTimeout') and `state.setTimeoutTimestamp` — the full
        KeyedProcessFunction contract (onTimer == the state.hasTimedOut
        branch). Requires `state_schema`.

        Batch input: `fn(pdf)` runs under applyInPandas per key group (state
        is just local variables — a batch group sees all its records).
        """
        if self.df.isStreaming:
            if state_schema is None:
                raise ValueError("streaming process() requires state_schema")
            return DataStream(
                self.df.groupBy(*self.keys).applyInPandasWithState(
                    fn, output_schema, state_schema, output_mode, timeout
                )
            )
        return DataStream(self.df.groupBy(*self.keys).applyInPandas(fn, output_schema))

    # ----------------------------------------------------- event-time windows
    # The reference kept only the Time duration helper of its window stack
    # (fsj:streaming/api/windowing/time/Time.java; no WindowOperator/assigner
    # survives — SURVEY.md §2.6). These are the live Spark-native rendering:
    # F.window/F.session_window group-bys, streaming-safe under a watermark.
    def tumbling_window(self, ts_col: str, size: str) -> "WindowedStream":
        return WindowedStream(self.df, self.keys, F.window(ts_col, size))

    def sliding_window(self, ts_col: str, size: str, slide: str) -> "WindowedStream":
        return WindowedStream(self.df, self.keys, F.window(ts_col, size, slide))

    def session_window(self, ts_col: str, gap: str) -> "WindowedStream":
        return WindowedStream(self.df, self.keys, F.session_window(ts_col, gap))


class WindowedStream:
    """Keyed + windowed view; aggregations group by (keys, window) and flatten
    the window struct into `window_start`/`window_end` columns."""

    def __init__(self, df: DataFrame, keys: list[Column], window: Column):
        self.df = df
        self.keys = keys
        self.window = window.alias("__w")

    def aggregate(self, *aggs: Any) -> DataStream:
        out = self.df.groupBy(*self.keys, self.window).agg(*_as_columns(aggs))
        cols = [c for c in out.columns if c != "__w"]
        return DataStream(
            out.select(
                *cols,
                F.col("__w.start").alias("window_start"),
                F.col("__w.end").alias("window_end"),
            )
        )

    def sum(self, field: str, alias: str | None = None) -> DataStream:
        return self.aggregate(F.sum(field).alias(alias or f"sum_{field}"))

    def min(self, field: str, alias: str | None = None) -> DataStream:
        return self.aggregate(F.min(field).alias(alias or f"min_{field}"))

    def max(self, field: str, alias: str | None = None) -> DataStream:
        return self.aggregate(F.max(field).alias(alias or f"max_{field}"))

    def count(self, alias: str = "count") -> DataStream:
        return self.aggregate(F.count(F.lit(1)).alias(alias))
