from elasticsearch_spark.query.executor import phrase_topk, search_topk
from elasticsearch_spark.query.online import bm25_topk_online

__all__ = ["search_topk", "phrase_topk", "bm25_topk_online"]
