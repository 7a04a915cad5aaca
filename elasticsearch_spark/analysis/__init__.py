from elasticsearch_spark.analysis.analyzers import (
    SIMPLE_TOKEN_PATTERN,
    analyze_series,
    sql_tokenize_expr,
    tokenize_column,
    tokenize_text,
)

__all__ = [
    "SIMPLE_TOKEN_PATTERN",
    "analyze_series",
    "sql_tokenize_expr",
    "tokenize_column",
    "tokenize_text",
]
