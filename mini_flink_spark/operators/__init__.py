from mini_flink_spark.operators.environment import StreamExecutionEnvironment
from mini_flink_spark.operators.stream import DataStream, KeyedStream
from mini_flink_spark.operators import aggregations
from mini_flink_spark.operators import running_reduce

__all__ = [
    "StreamExecutionEnvironment",
    "DataStream",
    "KeyedStream",
    "aggregations",
    "running_reduce",
]
