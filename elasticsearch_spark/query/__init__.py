from elasticsearch_spark.query.executor import search_topk
from elasticsearch_spark.query.online import bm25_topk_online

__all__ = ["search_topk", "bm25_topk_online"]
