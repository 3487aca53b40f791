from mini_flink_spark.functions import (
    bpe,
    clustering,
    dedup,
    hashing,
    multimodal,
    similarity,
    sketches,
    text,
)

__all__ = [
    "bpe",
    "clustering",
    "dedup",
    "hashing",
    "multimodal",
    "similarity",
    "sketches",
    "text",
]
