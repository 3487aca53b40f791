"""mini_flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of confucianzuoyuan/mini-flink.

The reference (see SURVEY.md) is a processing-time streaming dataflow core:
``fromElements/addSource -> map/flatMap/filter -> keyBy -> reduce -> print/addSink``
with sum/min/max/min_by/max_by aggregators and per-key ValueState.  This package
re-expresses that surface — and a large-scale training-data-pipeline extension
layer (dedup, similarity search, text analysis, multimodal columns) — on Spark
DataFrames and Structured Streaming.  Nothing is ported: Catalyst/Tungsten replace
the reference's scheduler/network/state plumbing entirely.
"""

from mini_flink_spark.session import get_spark
from mini_flink_spark.operators.environment import StreamExecutionEnvironment
from mini_flink_spark.operators.stream import DataStream, KeyedStream, WindowedStream

__all__ = [
    "get_spark",
    "StreamExecutionEnvironment",
    "DataStream",
    "KeyedStream",
    "WindowedStream",
]

__version__ = "0.1.0"
