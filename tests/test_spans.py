"""Span queries (span_first / span_near / span_not) vs the PyRef oracle.

Reference registration: index/query/IndicesQueriesModule.java:90-95.
"""

import pytest

from elasticsearch_spark.config import IndexConfig
from elasticsearch_spark.fixtures import generate_transcripts
from elasticsearch_spark.index import IndexReader, build_index
from elasticsearch_spark.oracle import PyRefEngine
from elasticsearch_spark.query import spans


@pytest.fixture(scope="module")
def setup(spark, tmp_root):
    corpus = generate_transcripts(n_convs=40, seed=57)
    cfg = IndexConfig(stored_cols=("role",), n_partitions=4,
                      dedup_latest_by="ts")
    idx = f"{tmp_root}/idx_spans"
    build_index(spark, spark.createDataFrame(corpus), idx, cfg)
    oracle = PyRefEngine(cfg.analyzer, cfg.bm25)
    keep = (
        corpus.sort_values("ts")
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .last()
    )
    for r in keep.itertuples():
        oracle.index((r.conv_id, r.turn_idx), r.text, role=r.role)
    return IndexReader(spark, idx), oracle


def _check(df, want, label):
    got = [((r["conv_id"], r["turn_idx"]), r["score"]) for r in df.collect()]
    assert [g[0] for g in got] == [w[0] for w in want], label
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) <= 1e-9 * max(1.0, abs(b)), (label, a, b)


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_span_first(setup, mode):
    reader, oracle = setup
    for term, end in [("error", 3), ("alpha", 1), ("timeout", 8)]:
        _check(
            spans.span_first_topk(reader, term, end, k=10, mode=mode),
            oracle.span_first(term, end, k=10),
            f"span_first({term},{end})",
        )


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_span_near_ordered(setup, mode):
    reader, oracle = setup
    for terms, slop in [
        (["alpha", "beta"], 0),
        (["alpha", "gamma"], 2),
        (["alpha", "beta", "gamma"], 1),
        (["error", "retry"], 4),
        (["beta", "alpha"], 3),  # reversed order: different matches
    ]:
        _check(
            spans.span_near_topk(reader, terms, slop=slop, k=10, mode=mode),
            oracle.span_near(terms, slop=slop, k=10),
            f"span_near({terms},{slop})",
        )


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_span_near_unordered(setup, mode):
    reader, oracle = setup
    for terms, slop in [(["alpha", "gamma"], 1), (["error", "timeout"], 3)]:
        _check(
            spans.span_near_topk(
                reader, terms, slop=slop, in_order=False, k=10, mode=mode
            ),
            oracle.span_near(terms, slop=slop, in_order=False, k=10),
            f"span_near_unordered({terms},{slop})",
        )


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_span_not(setup, mode):
    reader, oracle = setup
    for inc, exc, pre, post in [
        ("alpha", "beta", 0, 1),
        ("error", "timeout", 2, 2),
        ("alpha", "zzz_absent", 1, 1),  # exclude absent: all spans kept
    ]:
        _check(
            spans.span_not_topk(reader, inc, exc, pre=pre, post=post, k=10,
                                mode=mode),
            oracle.span_not(inc, exc, pre=pre, post=post, k=10),
            f"span_not({inc},{exc})",
        )


def test_span_near_unordered_requires_two(setup):
    reader, _ = setup
    with pytest.raises(ValueError):
        spans.span_near_topk(reader, ["a", "b", "c"], in_order=False)
