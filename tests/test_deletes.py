"""Document deletes (liveDocs/tombstone analog) — query exclusion, Lucene
stats semantics, idempotency, filter interaction, and merge rebase."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.config import IndexConfig
from elasticsearch_spark.index import IndexReader, build_index
from elasticsearch_spark.index.deletes import delete_docs, deletes_map, live_docs
from elasticsearch_spark.index.merge import tiered_merge
from elasticsearch_spark.query import phrase_topk, query_string_search, search_topk


@pytest.fixture()
def idx(spark, tmp_path):
    texts = [
        "error timeout retry",        # c0 (will be deleted)
        "error handled cleanly",      # c1
        "timeout threshold error",    # c2 (will be deleted)
        "retry with error backoff",   # c3
        "unrelated filler words",     # c4
        "error timeout again",        # c5
    ]
    corpus = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(texts))],
            "turn_idx": [0] * len(texts),
            "role": ["user" if i % 2 == 0 else "assistant" for i in range(len(texts))],
            "text": texts,
        }
    )
    d = str(tmp_path / "idx_del")
    build_index(
        spark, spark.createDataFrame(corpus), d,
        IndexConfig(stored_cols=("role",), n_partitions=2),
    )
    return IndexReader(spark, d)


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_deleted_docs_never_hit(idx, spark, mode):
    before = {r["conv_id"] for r in search_topk(idx, "error timeout", k=10, mode=mode).collect()}
    assert {"c0", "c2"} <= before
    n = delete_docs(idx, F.col("conv_id").isin(["c0", "c2"]))
    assert n == 2
    reader = IndexReader(spark, idx.index_dir)
    after_df = search_topk(reader, "error timeout", k=10, mode=mode)
    after = {r["conv_id"] for r in after_df.collect()}
    assert after == before - {"c0", "c2"}
    # Lucene semantics: stats keep counting tombstoned docs until merge —
    # surviving docs' scores are UNCHANGED by the delete
    before_scores = {
        r["conv_id"]: r["score"]
        for r in search_topk(idx, "error timeout", k=10, mode=mode).collect()
        if r["conv_id"] not in {"c0", "c2"}
    }
    after_scores = {r["conv_id"]: r["score"] for r in after_df.collect()}
    assert after_scores == before_scores


def test_delete_is_idempotent_and_incremental(idx, spark):
    assert delete_docs(idx, F.col("conv_id") == "c0") == 1
    assert delete_docs(idx, F.col("conv_id") == "c0") == 0  # replay no-op
    assert delete_docs(idx, F.col("conv_id").isin(["c0", "c2"])) == 1
    dm = deletes_map(idx)
    assert sum(len(v) for v in dm.values()) == 2
    assert live_docs(idx).count() == 4


def test_delete_with_filter_and_phrase(idx, spark):
    delete_docs(idx, F.col("conv_id") == "c5")
    reader = IndexReader(spark, idx.index_dir)
    hits = {
        r["conv_id"]
        for r in search_topk(
            reader, "error", k=10, filter_cond=F.col("role") == "user"
        ).collect()
    }
    assert "c5" not in hits and "c0" in hits
    ph = {r["conv_id"] for r in phrase_topk(reader, "error timeout", k=10).collect()}
    assert ph == {"c0"}  # c5 ('error timeout again') tombstoned
    # pure-filter query_string path excludes tombstones too
    qf = {
        r["conv_id"]
        for r in query_string_search(reader, "role:assistant", k=10).collect()
    }
    assert "c5" not in qf and "c1" in qf


def test_deletes_survive_tiered_merge(idx, spark):
    delete_docs(idx, F.col("conv_id").isin(["c0", "c2"]))
    want = [
        tuple(r)
        for r in search_topk(
            IndexReader(spark, idx.index_dir), "error timeout retry", k=10
        ).collect()
    ]
    tiered_merge(spark, idx.index_dir)
    reader = IndexReader(spark, idx.index_dir)
    got = [tuple(r) for r in search_topk(reader, "error timeout retry", k=10).collect()]
    assert got == want
    assert {r[0] for r in got}.isdisjoint({"c0", "c2"})
    dm = deletes_map(reader)
    assert sum(len(v) for v in dm.values()) == 2  # rebased, not lost


def test_explain_deleted_doc_reports_not_found(idx):
    """Explaining a tombstoned doc returns the empty frame — the reference's
    explain reports deleted docs as not found (round-3 advice fix)."""
    from elasticsearch_spark.query.explain import explain_indexed

    before = explain_indexed(idx, "error timeout", F.col("conv_id") == "c0")
    assert len(before) >= 1
    delete_docs(idx, F.col("conv_id") == "c0")
    after = explain_indexed(idx, "error timeout", F.col("conv_id") == "c0")
    assert len(after) == 0
    # a live doc still explains fine
    live = explain_indexed(idx, "error timeout", F.col("conv_id") == "c5")
    assert len(live) >= 1
