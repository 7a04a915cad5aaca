from elasticsearch_spark.streaming.incremental import incremental_index

__all__ = ["incremental_index"]
