"""The remaining user-extension surfaces Spark 4 offers a migrating
mini-flink user beyond map/flatMap/filter lambdas: Python UDTFs (the
SQL-native flatMap — a table function usable from `spark.sql`) and
`Dataset.observe` metrics (the accumulator surface; the reference exposes
`getIntCounter` accumulators via RichFunction contexts,
flink-core AbstractRuntimeUDFContext, rendered here as observation metrics
that travel with the query instead of a side channel).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_python_udtf_is_the_sql_flatmap(spark):
    # StreamFlatMap.java:48-52 semantics from SQL: one input row fans out to
    # 0..n output rows through a registered table function
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class Tokenize:
        def eval(self, line: str):
            for i, w in enumerate(line.split()):
                yield w, i

    spark.udtf.register("tokenize", Tokenize)
    out = spark.sql(
        "SELECT t.word, t.pos FROM VALUES ('hello world'), ('hello spark') v(line), "
        "LATERAL tokenize(line) t"
    ).collect()
    words = sorted((r.word, r.pos) for r in out)
    assert words == [("hello", 0), ("hello", 0), ("spark", 1), ("world", 1)]


def test_observe_metrics_replace_accumulators(spark):
    # the reference's IntCounter accumulator (int_counter in
    # operators/environment.py) has a declarative twin: observe() metrics
    # computed inside the job, read after the action — no driver side channel
    from pyspark.sql import Observation

    obs = Observation("gate")
    df = (
        spark.range(1000)
        .observe(obs, F.count(F.lit(1)).alias("seen"), F.sum("id").alias("total"))
        .filter("id % 2 = 0")
    )
    assert df.count() == 500
    assert obs.get["seen"] == 1000  # observed BEFORE the filter
    assert obs.get["total"] == 499500
