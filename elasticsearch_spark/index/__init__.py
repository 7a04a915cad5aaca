from elasticsearch_spark.index.builder import build_index
from elasticsearch_spark.index.reader import IndexReader

__all__ = ["build_index", "IndexReader"]
