"""Index reader — lazy DataFrame views over the segment tables."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from elasticsearch_spark.config import AnalyzerConfig, BM25Params, IndexConfig


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str) -> None:
        self.spark = spark
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        c = self.meta["config"]
        c["analyzer"] = AnalyzerConfig(**{**c["analyzer"], "stopwords": tuple(c["analyzer"]["stopwords"])})
        c["bm25"] = BM25Params(**c["bm25"])
        c["key_cols"] = tuple(c["key_cols"])
        c["stored_cols"] = tuple(c["stored_cols"])
        self.cfg = IndexConfig(**c)

    @property
    def n_docs(self) -> int:
        return self.meta["n_docs"]

    @property
    def avgdl(self) -> float:
        return self.meta["avgdl"]

    def _read(self, sub: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.index_dir, sub))

    def postings(self) -> DataFrame:
        return self._read("postings")

    def docs(self) -> DataFrame:
        return self._read("docs")

    def norms(self) -> DataFrame:
        return self._read("norms")

    def termstats(self) -> DataFrame:
        return self._read("termstats")

    def manifest(self) -> DataFrame:
        return self._read("manifest")

    def query_term_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """df/ttf for the query terms only (tiny collect — the DFS-phase
        analog, search/dfs/DfsPhase.java:63-104)."""
        if not terms:
            return {}
        from pyspark.sql import functions as F

        rows = (
            self.termstats()
            .where(F.col("term").isin(list(set(terms))))
            .select("term", "df", "ttf")
            .collect()
        )
        return {r["term"]: (r["df"], r["ttf"]) for r in rows}
