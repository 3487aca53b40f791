from mini_flink_spark.functions import hashing, text, dedup, similarity, multimodal

__all__ = ["hashing", "text", "dedup", "similarity", "multimodal"]
