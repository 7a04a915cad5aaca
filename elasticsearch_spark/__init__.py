"""elasticsearch_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch rebuild of the query & data-processing capabilities of
Elasticsearch 2.0 (reference: luclipse/elasticsearch) on idiomatic Spark:

- partition-parallel inverted-index build over transcript/document tables
  (`elasticsearch_spark.index`), with FOR/varint block-compressed postings,
  Lucene-compatible byte315 norm quantization, tiered segment merge with
  hot-term salting, and a checkpoint/lineage manifest;
- BM25 (k1=1.2, b=0.75, global DFS statistics) top-k query execution with
  block-max WAND pruning (`elasticsearch_spark.query`);
- the ES query/filter/aggregation operator surface re-expressed as
  DataFrame combinators (`elasticsearch_spark.ops`);
- training-data pipeline operators: dedup, similarity search, text stats
  (`elasticsearch_spark.pipeline`).

Everything is DataFrame-first; Python touches data only through
vectorized pandas/Arrow UDFs (no per-row Python).
"""

__version__ = "0.1.0"

from elasticsearch_spark.config import AnalyzerConfig, BM25Params, IndexConfig

__all__ = ["AnalyzerConfig", "BM25Params", "IndexConfig", "__version__"]
