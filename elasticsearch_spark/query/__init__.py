from elasticsearch_spark.query.executor import (
    common_terms_search,
    fuzzy_search_topk,
    phrase_prefix_topk,
    phrase_topk,
    query_string_search,
    search_topk,
    simple_query_string_search,
    terms_topk,
)
from elasticsearch_spark.query.online import (
    bm25_topk_online,
    fuzzy_topk_online,
    multi_match_online,
)

__all__ = [
    "search_topk",
    "terms_topk",
    "fuzzy_search_topk",
    "phrase_topk",
    "phrase_prefix_topk",
    "common_terms_search",
    "query_string_search",
    "simple_query_string_search",
    "bm25_topk_online",
    "multi_match_online",
    "fuzzy_topk_online",
]
