"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` smoke-runs the flagship path: build the segmented inverted
index over the sf0.001 `documents` table (partition-parallel mapInPandas
segment build, SURVEY.md §3.2 analog) and answer a filtered multi-term BM25
match query through it (block-max pruned top-k, §3.1 analog).

`queries()` / `oracle_sql()` delegate to the registry in
`elasticsearch_spark/entry_queries.py` — one entry per implemented operator
from SURVEY.md §2 plus the training-data pipeline ops, each paired (where
SQL-expressible) with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elasticsearch_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = "/root/testdata/sf0.001"
    return entry_queries._indexed(spark, sf_dir, "query fast merge", k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
