"""Running-reduce parity: batch window rendering and opaque-callable fold vs a
sequential reference fold (the invariant from SURVEY.md §5 item 3)."""

import pandas as pd
from pyspark.sql import Window, functions as F

from mini_flink_spark.operators.running_reduce import running_agg, running_fold
from mini_flink_spark.session import read_table


def _ref_running_sum(pdf: pd.DataFrame, key, order, val):
    pdf = pdf.sort_values([key, order])
    pdf = pdf.assign(expected=pdf.groupby(key)[val].cumsum())
    return pdf


def test_running_agg_matches_sequential_fold(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    out = running_agg(events, ["user_id"], "event_id", running_sum=F.sum("value")).select(
        "user_id", "event_id", "running_sum"
    )
    got = out.toPandas().set_index("event_id")["running_sum"].to_dict()
    exp = _ref_running_sum(events.toPandas(), "user_id", "event_id", "value")
    for eid, e in exp.set_index("event_id")["expected"].to_dict().items():
        assert abs(got[eid] - e) < 1e-6


def test_running_agg_last_row_equals_converged(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    run = running_agg(events, ["user_id"], "event_id", running_sum=F.sum("value"))
    last = (
        run.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("user_id").orderBy(F.desc("event_id"))),
        )
        .filter("rn = 1")
        .select("user_id", "running_sum")
    )
    conv = events.groupBy("user_id").agg(F.sum("value").alias("s"))
    j = last.join(conv, "user_id")
    assert j.filter(F.abs(F.col("running_sum") - F.col("s")) > 1e-6).count() == 0


def test_running_fold_wordcount_sequence(spark):
    # The reference's canonical cumulative emission: (hello,1),(hello,2) ...
    data = [(0, "hello", 1), (1, "world", 1), (2, "hello", 1), (3, "world", 1)]
    df = spark.createDataFrame(data, "seq bigint, word string, c bigint")

    def add(acc, row):
        return {"c": acc["c"] + row["c"]}

    out = running_fold(
        df, ["word"], "seq", add, ["c"], "word string, seq bigint, c bigint"
    )
    rows = sorted(((r.word, r.seq, r.c) for r in out.collect()))
    assert rows == [("hello", 0, 1), ("hello", 2, 2), ("world", 1, 1), ("world", 3, 2)]
