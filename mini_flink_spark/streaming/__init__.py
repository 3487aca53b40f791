from mini_flink_spark.streaming.wordcount import (
    wordcount_batch,
    wordcount_stream_update,
    run_stream_to_memory,
)

__all__ = ["wordcount_batch", "wordcount_stream_update", "run_stream_to_memory"]
