"""match_phrase rank/score identity vs the PyRef oracle + merge invariance.

Reference: MatchQuery.java:215-220 (PhraseQuery construction); slop=0 scoring
is ExactPhraseScorer semantics. Positions survive tiered merges byte-exactly.
"""

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.config import IndexConfig
from elasticsearch_spark.fixtures import generate_transcripts
from elasticsearch_spark.index import IndexReader, build_index
from elasticsearch_spark.index.merge import tiered_merge
from elasticsearch_spark.oracle import PyRefEngine
from elasticsearch_spark.query import phrase_topk

PHRASES = [
    ("tiebreak alpha beta", 0),
    ("alpha beta gamma", 0),
    ("alpha gamma", 0),      # non-adjacent: no exact match
    ("alpha gamma", 1),      # slop=1 bridges the gap
    ("don't panic", 0),
    ("tok0000 tok0001", 0),
    ("error timeout", 2),
    ("zzz_absent phrase", 0),
]


@pytest.fixture(scope="module")
def setup(spark, tmp_root):
    corpus = generate_transcripts(n_convs=40, seed=13)
    cfg = IndexConfig(
        stored_cols=("role", "tool"), n_partitions=4, dedup_latest_by="ts"
    )
    idx = f"{tmp_root}/idx_phrase"
    build_index(spark, spark.createDataFrame(corpus), idx, cfg)
    oracle = PyRefEngine(cfg.analyzer, cfg.bm25)
    keep = (
        corpus.sort_values("ts")
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .last()
    )
    for r in keep.itertuples():
        oracle.index((r.conv_id, r.turn_idx), r.text, role=r.role, tool=r.tool)
    return IndexReader(spark, idx), oracle, idx


def _check(reader, oracle, text, slop, mode):
    got = [
        ((r["conv_id"], r["turn_idx"]), r["score"])
        for r in phrase_topk(reader, text, k=10, slop=slop, mode=mode).collect()
    ]
    want = oracle.match_phrase(text, k=10, slop=slop)
    assert [g[0] for g in got] == [w[0] for w in want], (text, slop, mode)
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) <= 1e-9 * max(1.0, abs(b)), (text, a, b)


def test_phrase_rank_identical_local_and_spark(setup):
    reader, oracle, _ = setup
    for text, slop in PHRASES:
        _check(reader, oracle, text, slop, "local")
        _check(reader, oracle, text, slop, "spark")


def test_phrase_filtered(setup):
    reader, oracle, _ = setup
    got = [
        (r["conv_id"], r["turn_idx"])
        for r in phrase_topk(
            reader, "tok0000 tok0001", k=10,
            filter_cond=F.col("role") == "assistant",
        ).collect()
    ]
    want = [
        key
        for key, _ in oracle.match_phrase(
            "tok0000 tok0001", k=10,
            filter_fn=lambda d: d["role"] == "assistant",
        )
    ]
    assert got == want


def test_phrase_survives_tiered_merge(setup, spark):
    reader, oracle, idx = setup
    before = {
        (text, slop): [
            tuple(r) for r in phrase_topk(reader, text, k=10, slop=slop).collect()
        ]
        for text, slop in PHRASES
    }
    tiered_merge(spark, idx)
    reader2 = IndexReader(spark, idx)
    for (text, slop), want in before.items():
        got = [tuple(r) for r in phrase_topk(reader2, text, k=10, slop=slop).collect()]
        assert got == want, (text, slop)


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_phrase_prefix_rank_identical(setup, mode):
    """match_phrase_prefix (MatchQuery.java:215-220) vs the PyRef oracle,
    including prefix-only queries and a binding expansion cap."""
    from elasticsearch_spark.index import IndexReader
    from elasticsearch_spark.query import phrase_prefix_topk

    stale_reader, oracle, idx = setup
    # fresh reader: the tiered-merge test above rewrites the segment set,
    # so the module fixture's memoized file listing is stale (also a nice
    # check that phrase_prefix works over merged segments)
    reader = IndexReader(stale_reader.spark, idx)
    cases = [
        ("alpha bet", 50),    # classic autocomplete shape
        ("tok000", 50),       # prefix-only (no fixed terms)
        ("alpha beta gam", 50),
        ("tiebreak alp", 50),
        ("alpha t", 3),       # cap binds: first 3 dictionary terms only
        ("zzz_absent pre", 50),
    ]
    for text, max_exp in cases:
        got = [
            ((r["conv_id"], r["turn_idx"]), r["score"])
            for r in phrase_prefix_topk(
                reader, text, k=10, max_expansions=max_exp, mode=mode
            ).collect()
        ]
        want = oracle.match_phrase_prefix(text, k=10, max_expansions=max_exp)
        assert [g[0] for g in got] == [w[0] for w in want], (text, max_exp, mode)
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) <= 1e-9 * max(1.0, abs(b)), (text, a, b)
