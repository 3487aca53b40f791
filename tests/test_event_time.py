"""Event-time semantics: watermarked windowed aggregation on the DataStream
API — streaming/batch convergence and late-data drop past the watermark.

The reference carries all this machinery dead (SURVEY.md §2.8: Watermark,
StatusWatermarkValve min-alignment, timers — none reachable); this is its live
Spark rendering, so the semantics under test are Structured Streaming's:
windows finalize at watermark = max(event_ts) - delay, later rows are dropped.
"""

import os
import tempfile
import time
from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from mini_flink_spark.operators.environment import StreamExecutionEnvironment
from mini_flink_spark.operators.stream import DataStream
from mini_flink_spark.sources import parquet_stream, write_stream_fixture
from mini_flink_spark.streaming import run_stream_to_memory


def ts(s):
    return datetime.fromisoformat(s)


SCHEMA = "user string, ts timestamp, value long"


def test_batch_windowed_keyed_stream(spark):
    env = StreamExecutionEnvironment(spark)
    rows = [
        ("a", ts("2024-01-01 10:05:00"), 1),
        ("a", ts("2024-01-01 10:20:00"), 2),
        ("a", ts("2024-01-01 11:05:00"), 4),
        ("b", ts("2024-01-01 10:59:59"), 8),
    ]
    out = (
        env.from_collection(rows, SCHEMA)
        .assign_timestamps_and_watermarks("ts", "10 minutes")  # batch: identity
        .key_by("user")
        .tumbling_window("ts", "1 hour")
        .sum("value")
        .to_df()
    )
    got = {(r.user, r.window_start.hour): r.sum_value for r in out.collect()}
    assert got == {("a", 10): 3, ("a", 11): 4, ("b", 10): 8}


def test_streaming_windowed_converges_to_batch(spark, sf_dir):
    from mini_flink_spark.session import read_table

    events = read_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    fixture = write_stream_fixture(events, tempfile.mkdtemp(prefix="win_stream_"), n_files=3)
    stream = parquet_stream(spark, fixture, "user_id bigint, ts timestamp, value double")

    windowed = (
        DataStream(stream)
        .assign_timestamps_and_watermarks("ts", "1 hour")
        .key_by("user_id")
        .tumbling_window("ts", "1 hour")
        .count()
    )
    got = run_stream_to_memory(windowed.to_df(), spark, "update").toPandas()
    # last update per (key, window) is the converged count
    got = (
        got.sort_index()
        .groupby(["user_id", "window_start"])["count"]
        .last()
        .reset_index()
    )
    exp = (
        DataStream(events)
        .key_by("user_id")
        .tumbling_window("ts", "1 hour")
        .count()
        .to_df()
        .select("user_id", "window_start", "count")
        .toPandas()
    )
    got = got.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _write_one_file(spark, rows, path, name, mtime):
    pdf = pd.DataFrame(rows, columns=["user", "ts", "value"])
    os.makedirs(path, exist_ok=True)
    fp = os.path.join(path, name)
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(pdf, schema=pa.schema([
        ("user", pa.string()),
        ("ts", pa.timestamp("us")),
        ("value", pa.int64()),
    ]))
    pq.write_table(table, fp)
    os.utime(fp, (mtime, mtime))


def test_watermark_drops_late_data(spark):
    """A very-late row is dropped once the watermark has propagated.

    Spark's late-event filter uses the *previous* batch's watermark
    (dual-watermark semantics, so a row arriving in the batch right after
    the advance may still be admitted — the watermark contract is "windows
    stay open at least this long", not "close exactly then"). Trigger 1
    advances the watermark to 12:30; trigger 3's late row for window A
    (end 11:00 < 12:30) must be dropped: no further update for A."""
    path = tempfile.mkdtemp(prefix="late_")
    now = time.time()
    # trigger 1: window A (10:00) and a row at 13:00 -> watermark := 12:30
    _write_one_file(
        spark,
        [("a", ts("2024-01-01 10:05:00"), 1), ("a", ts("2024-01-01 13:00:00"), 1)],
        path, "f1.parquet", now - 180,
    )
    # trigger 2: on-time row; watermark 12:30 now governs late filtering
    _write_one_file(
        spark, [("a", ts("2024-01-01 13:05:00"), 1)], path, "f2.parquet", now - 120
    )
    # trigger 3: very-late row for window A — dropped
    _write_one_file(
        spark, [("a", ts("2024-01-01 10:20:00"), 1)], path, "f3.parquet", now - 60
    )

    stream = parquet_stream(spark, path, SCHEMA, max_files_per_trigger=1)
    windowed = (
        DataStream(stream)
        .assign_timestamps_and_watermarks("ts", "30 minutes")
        .key_by("user")
        .tumbling_window("ts", "1 hour")
        .count()
    )
    updates = run_stream_to_memory(windowed.to_df(), spark, "update").toPandas()

    win_a = updates[updates.window_start == ts("2024-01-01 10:00:00")]
    # exactly one update for window A, count 1 — the late row never lands
    assert list(win_a["count"]) == [1], f"late row was not dropped: {updates}"
    win_d = updates[updates.window_start == ts("2024-01-01 13:00:00")]
    # the on-time 13:05 row DID land: final count for window D is 2
    assert sorted(win_d["count"]) == [1, 2]


def test_csv_json_roundtrip(spark):
    """Source/sink breadth: csv and json read back what write produced."""
    env = StreamExecutionEnvironment(spark)
    ds = env.from_collection(
        [(1, "x", 1.5), (2, "y", -2.0), (3, "z", 0.0)], "id bigint, s string, v double"
    )
    base = tempfile.mkdtemp(prefix="io_")
    ds.write_csv(f"{base}/c")
    ds.write_json(f"{base}/j")
    got_csv = env.read_csv(f"{base}/c", schema="id bigint, s string, v double")
    got_json = env.read_json(f"{base}/j", schema="id bigint, s string, v double")
    exp = sorted(map(tuple, ds.collect()))
    assert sorted(map(tuple, got_csv.collect())) == exp
    assert sorted(map(tuple, got_json.collect())) == exp


def test_timer_based_inactivity_sessions(spark):
    """Event-time timers (the live InternalTimerServiceImpl rendering): a
    key's session row is emitted when the watermark passes last_event + gap;
    keys whose timers the final watermark never reaches stay unflushed."""
    from mini_flink_spark.streaming.sessions import keyed_inactivity_sessions

    path = tempfile.mkdtemp(prefix="sess_")
    now = time.time()
    _write_one_file(
        spark,
        [("a", ts("2024-01-01 10:00:00"), 1), ("a", ts("2024-01-01 10:05:00"), 2)],
        path, "f1.parquet", now - 180,
    )
    _write_one_file(spark, [("b", ts("2024-01-01 12:00:00"), 5)], path, "f2.parquet", now - 120)
    _write_one_file(spark, [("c", ts("2024-01-01 13:00:00"), 7)], path, "f3.parquet", now - 60)

    stream = parquet_stream(spark, path, SCHEMA, max_files_per_trigger=1).withWatermark(
        "ts", "0 seconds"
    )
    out = keyed_inactivity_sessions(stream, "user", "value", "ts", gap_seconds=1800)
    got = run_stream_to_memory(out, spark, "append").toPandas()

    rows = {r.user: r for r in got.itertuples()}
    # a timed out (timer 10:35 < watermark 12:00 at batch 3)
    assert rows["a"].n_events == 2 and rows["a"].sum_value == 3.0
    assert rows["a"].session_start == ts("2024-01-01 10:00:00")
    assert rows["a"].session_end == ts("2024-01-01 10:05:00")
    # b timed out in the trailing no-data batch (timer 12:30 < watermark 13:00)
    assert rows["b"].n_events == 1
    # c's timer (13:30) is past the final watermark (13:00): not flushed
    assert "c" not in rows
