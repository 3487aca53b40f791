"""AQE skew-join handling — the runtime answer to hot keys at 100 TB.

The reference shuffles every record of a key to one subtask with no skew
mitigation at all (KeyGroupStreamPartitioner.java:45-56 — a hot key simply
overloads its task). This engine's stance is: AQE splits skewed partitions at
runtime (verified here), and `salted_agg` covers the aggregation case
(tests/test_properties.py). The thresholds are lowered so a local-scale hot
key exhibits the same mechanics a multi-GB hot partition would on a cluster.
"""

from pyspark.sql import functions as F

SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    prev = {k: spark.conf.get(k, None) for k in SKEW_CONF}
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    try:
        # one pathological key (300k rows) + 100 normal keys
        fact = spark.range(300_000).select(
            F.lit(0).alias("k"), F.md5(F.col("id").cast("string")).alias("v")
        ).union(
            spark.range(1_000).select(
                (F.col("id") % 100 + 1).alias("k"),
                F.md5(F.col("id").cast("string")).alias("v"),
            )
        )
        dim = spark.range(101).select(
            F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
        )
        j = fact.join(dim, "k")
        rows = j.count()  # count() re-plans; execute via collect on j itself
        _ = j.collect()
        # the AQE *final* plan of the executed DataFrame must carry the skew
        # split marker — the hot partition was divided across extra tasks
        # instead of serializing on one
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert rows == 301_000
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
