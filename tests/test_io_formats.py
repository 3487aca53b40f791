"""IO-format round trips on the environment/stream surface: csv, json, orc,
text, partitioned orc. The reference has no file connectors at all (SURVEY.md
§2.5 — print + user SinkFunction are its entire sink surface); these are the
Spark-native formats a migrating user gains, so their read↔write fidelity is
part of the contract.
"""

import pytest
from pyspark.sql import functions as F

from mini_flink_spark import StreamExecutionEnvironment
from mini_flink_spark.session import read_table


@pytest.fixture()
def env(spark):
    return StreamExecutionEnvironment.get_execution_environment(spark)


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    # small, typed slice: string/int/double/timestamp columns
    return (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value", "ts")
        .orderBy("event_id")
        .limit(200)
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("event_id").collect()]


def test_orc_round_trip_schema_and_values(env, sample, tmp_path):
    p = str(tmp_path / "events_orc")
    env.from_table  # surface exists
    from mini_flink_spark.operators.stream import DataStream

    DataStream(sample).write_orc(p)
    back = env.read_orc(p).df
    assert back.schema == sample.schema
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_orc_partitioned_write_prunes_partitions(env, sample, tmp_path):
    p = str(tmp_path / "events_orc_part")
    from mini_flink_spark.operators.stream import DataStream

    DataStream(sample).write_orc(p, partition_by=("event_type",))
    back = env.read_orc(p).df.filter(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the non-matching partition dirs never reach the scan
    assert "purchase" in plan
    assert back.count() == sample.filter(F.col("event_type") == "purchase").count()


def test_csv_round_trip_with_schema(env, sample, tmp_path):
    p = str(tmp_path / "events_csv")
    from mini_flink_spark.operators.stream import DataStream

    flat = sample.drop("ts")  # csv has no native timestamp fidelity guarantee
    DataStream(flat).write_csv(p)
    back = env.read_csv(p, schema=flat.schema).df
    assert back.schema == flat.schema
    assert _sorted_rows(back) == _sorted_rows(flat)


def test_json_round_trip_with_schema(env, sample, tmp_path):
    p = str(tmp_path / "events_json")
    from mini_flink_spark.operators.stream import DataStream

    flat = sample.drop("ts")
    DataStream(flat).write_json(p)
    back = env.read_json(p, schema=flat.schema).df
    assert back.schema == flat.schema
    assert _sorted_rows(back) == _sorted_rows(flat)


def test_text_source_lines(env, tmp_path):
    p = str(tmp_path / "lines.txt")
    with open(p, "w") as f:
        f.write("hello world\nhello spark\n")
    ds = env.read_text(p)
    got = sorted(r.value for r in ds.df.collect())
    assert got == ["hello spark", "hello world"]


def test_json_corrupt_records_are_quarantined(env, tmp_path):
    # PERMISSIVE ingestion: malformed lines land in _corrupt_record instead of
    # failing the job — the posture a 100 TB crawl ingest needs (one bad file
    # must not kill a 10-hour run)
    p = tmp_path / "mixed.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\nNOT JSON AT ALL\n{"a": 4}\n')
    df = env.spark.read.schema("a long, _corrupt_record string").json(str(p)).cache()
    assert df.count() == 4
    assert df.filter("_corrupt_record is not null").count() == 1
    assert df.filter("a is not null").count() == 3


def test_csv_quoted_fields_round_trip(env, tmp_path):
    # delimiter/quote/escape fidelity: embedded commas, quotes, and newlines
    from pyspark.sql import Row

    src = env.spark.createDataFrame(
        [
            Row(id=1, s='plain'),
            Row(id=2, s='with,comma'),
            Row(id=3, s='with "quotes"'),
            Row(id=4, s='multi\nline'),
        ]
    )
    p = str(tmp_path / "quoted_csv")
    src.write.option("header", True).option("escape", '"').csv(p)
    back = (
        env.spark.read.option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .schema("id long, s string")
        .csv(p)
    )
    assert sorted((r.id, r.s) for r in back.collect()) == sorted(
        (r.id, r.s) for r in src.collect()
    )
