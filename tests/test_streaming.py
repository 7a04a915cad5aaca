"""Structured-Streaming incremental index == batch index results.

The NRT-refresh analog (InternalEngine.java:367-369): micro-batches append
immutable segments; queries over the incrementally-built index must be
rank/score-identical to a one-shot batch build over the same rows (global
DFS statistics are refreshed per batch)."""

import os

import pytest

from elasticsearch_spark.config import IndexConfig
from elasticsearch_spark.fixtures import generate_transcripts
from elasticsearch_spark.index import IndexReader, build_index
from elasticsearch_spark.query import phrase_topk, search_topk
from elasticsearch_spark.streaming import incremental_index

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp"
)


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=40, seed=21)


def test_incremental_equals_batch(spark, tmp_root, corpus):
    cfg = IndexConfig(stored_cols=("role", "tool"), n_partitions=4)

    # batch reference build
    batch_idx = f"{tmp_root}/idx_batch_ref"
    build_index(spark, spark.createDataFrame(corpus), batch_idx, cfg)

    # stream source: three parquet "arrival" files
    src = f"{tmp_root}/stream_src"
    os.makedirs(src, exist_ok=True)
    n = len(corpus)
    for i, lo in enumerate(range(0, n, n // 3 + 1)):
        part = corpus.iloc[lo : lo + n // 3 + 1]
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/chunk{i}"
        )

    stream_idx = f"{tmp_root}/idx_stream"
    seen = []
    q = incremental_index(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk*"),
        stream_idx,
        cfg,
        on_batch=lambda bid, n_rows: seen.append((bid, n_rows)),
    )
    assert q.awaitTermination(900), "stream did not drain in bound"
    # (under full-suite host load the availableNow drain can exceed 300 s;
    # reading the index mid-merge races segment deletion)
    assert len(seen) >= 2, seen  # really incremental (several micro-batches)
    assert sum(r for _, r in seen) == n

    a = IndexReader(spark, batch_idx)
    b = IndexReader(spark, stream_idx)
    assert a.n_docs == b.n_docs
    assert abs(a.avgdl - b.avgdl) < 1e-12
    for text, kw in [
        ("error timeout", {}),
        ("tok0000 tok0001", {"operator": "and"}),
        ("tiebreak alpha", {}),
    ]:
        ra = [tuple(r) for r in search_topk(a, text, k=10, **kw).collect()]
        rb = [tuple(r) for r in search_topk(b, text, k=10, **kw).collect()]
        assert ra == rb, (text, kw)
    pa_ = [tuple(r) for r in phrase_topk(a, "tiebreak alpha beta", k=10).collect()]
    pb_ = [tuple(r) for r in phrase_topk(b, "tiebreak alpha beta", k=10).collect()]
    assert pa_ == pb_


def test_incremental_merges_bound_segments(spark, tmp_root, corpus):
    """With a low merge threshold the stream job must compact segments."""
    cfg = IndexConfig(stored_cols=("role",), n_partitions=4)
    src = f"{tmp_root}/stream_src2"
    os.makedirs(src, exist_ok=True)
    n = len(corpus)
    step = n // 6 + 1
    for i, lo in enumerate(range(0, n, step)):
        part = corpus.iloc[lo : lo + step]
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/chunk{i}"
        )
    stream_idx = f"{tmp_root}/idx_stream_merge"
    q = incremental_index(
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk*"),
        stream_idx,
        cfg,
        merge_threshold=6,
    )
    assert q.awaitTermination(900), "stream did not drain in bound"
    # (under full-suite host load the availableNow drain can exceed 300 s;
    # reading the index mid-merge races segment deletion)
    man = spark.read.parquet(f"{stream_idx}/manifest").toPandas()
    merged = man[man["merge_fan_in"] > 1]
    assert len(merged) >= 1  # at least one tiered merge ran
    reader = IndexReader(spark, stream_idx)
    assert reader.n_docs == n
    assert search_topk(reader, "error", k=5).count() > 0


def test_streaming_exact_dedup_across_batches(spark, tmp_root):
    """applyInPandasWithState dedup: a content hash emitted in batch N is
    dropped in every later batch; within a batch the smallest key wins —
    so the drained stream equals the batch exact_dedup over the union."""
    import pandas as pd

    from elasticsearch_spark.pipeline.dedup import exact_dedup
    from elasticsearch_spark.streaming.dedup_stream import streaming_exact_dedup

    texts = ["alpha beta", "gamma delta", "alpha beta", "epsilon",
             "gamma delta", "zeta", "alpha beta", "eta theta"]
    corpus = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    src = f"{tmp_root}/dedup_stream_src"
    os.makedirs(src, exist_ok=True)
    # ordered chunks: first arrival == smallest doc_id, so streaming
    # first-seen-wins and batch keep-smallest coincide
    for i in range(0, len(corpus), 2):
        spark.createDataFrame(corpus.iloc[i : i + 2]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/chunk{i // 2}")
    out_rows = []
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk*")
    )
    q = (
        streaming_exact_dedup(stream, "text", "doc_id")
        .writeStream.foreachBatch(
            lambda df, bid: out_rows.extend(df.collect())
        )
        .option("checkpointLocation", f"{tmp_root}/dedup_stream_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(900), "stream did not drain in bound"
    got = sorted(r["key"] for r in out_rows)
    want = sorted(
        r["doc_id"]
        for r in exact_dedup(
            spark.createDataFrame(corpus), "text", "doc_id"
        ).collect()
    )
    assert got == want == [0, 1, 3, 5, 7]


def test_streaming_exact_dedup_string_keys(spark, tmp_root):
    """Round-4 advice: the output/state schema follows the key column's
    type — string conv_id-style keys work end to end."""
    import pandas as pd

    from elasticsearch_spark.streaming.dedup_stream import streaming_exact_dedup

    corpus = pd.DataFrame(
        {
            "conv_id": [f"conv-{i:03d}" for i in range(6)],
            "text": ["a b", "c d", "a b", "e f", "c d", "g h"],
        }
    )
    src = f"{tmp_root}/dedup_stream_str_src"
    os.makedirs(src, exist_ok=True)
    for i in range(0, len(corpus), 3):
        spark.createDataFrame(corpus.iloc[i : i + 3]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/chunk{i // 3}")
    out_rows = []
    stream = (
        spark.readStream.schema("conv_id string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/chunk*")
    )
    q = (
        streaming_exact_dedup(stream, "text", "conv_id")
        .writeStream.foreachBatch(
            lambda df, bid: out_rows.extend(df.collect())
        )
        .option("checkpointLocation", f"{tmp_root}/dedup_stream_str_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(900), "stream did not drain in bound"
    assert sorted(r["key"] for r in out_rows) == [
        "conv-000", "conv-001", "conv-003", "conv-005"
    ]
