"""query_string parser + BooleanQuery scorer vs the PyRef oracle."""

import pytest

from elasticsearch_spark.config import IndexConfig
from elasticsearch_spark.fixtures import generate_transcripts
from elasticsearch_spark.index import IndexReader, build_index
from elasticsearch_spark.oracle import PyRefEngine
from elasticsearch_spark.query import query_string_search
from elasticsearch_spark.query.ast import parse_query_string

QUERIES = [
    "error timeout",
    "error AND timeout",
    "+error -timeout",
    "(error OR timeout) AND retry",
    '"alpha beta gamma"',
    '"alpha gamma"~1',
    "role:assistant error",
    'error AND "tiebreak alpha"',
    "NOT error timeout",
    "tok0001 tok0002 tok0003",
    "tool:bash retry",
    "zzz_absent AND error",
]


@pytest.fixture(scope="module")
def setup(spark, tmp_root):
    corpus = generate_transcripts(n_convs=40, seed=31)
    idx = f"{tmp_root}/idx_qs"
    cfg = IndexConfig(stored_cols=("role", "tool"), n_partitions=3,
                      dedup_latest_by="ts")
    build_index(spark, spark.createDataFrame(corpus), idx, cfg)
    oracle = PyRefEngine(cfg.analyzer, cfg.bm25)
    keep = (
        corpus.sort_values("ts")
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .last()
    )
    for r in keep.itertuples():
        oracle.index((r.conv_id, r.turn_idx), r.text, role=r.role, tool=r.tool)
    return IndexReader(spark, idx), oracle


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_query_string_rank_identical(setup, mode):
    reader, oracle = setup
    for q in QUERIES:
        got = [
            ((r["conv_id"], r["turn_idx"]), r["score"])
            for r in query_string_search(reader, q, k=10, mode=mode).collect()
        ]
        want = oracle.query_string(q, k=10)
        assert [g[0] for g in got] == [w[0] for w in want], (q, mode)
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) <= 1e-9 * max(1.0, abs(b)), (q, a, b)


def test_parser_shapes():
    tok = lambda s: [w.lower() for w in s.split()]  # noqa: E731
    pq = parse_query_string('+a -b (c OR d) "e f"~2 role:user ts:[2025 TO *]', tok)
    occs = [(c.occur, c.terms, c.phrase, c.slop) for c in pq.clauses]
    assert occs[0] == ("must", ["a"], None, 0)
    assert occs[1] == ("must_not", ["b"], None, 0)
    assert occs[2] == ("should", ["c", "d"], None, 0)
    assert occs[3] == ("should", [], ["e", "f"], 2)
    assert ("role", "eq", "user") in pq.filters
    assert ("ts", "gte", 2025) in pq.filters


def test_pure_filter_query(setup):
    reader, _ = setup
    out = query_string_search(reader, "role:assistant", k=5).collect()
    assert len(out) == 5
    assert all(r["score"] == 1.0 for r in out)


def test_simple_query_string_lenient(setup):
    from elasticsearch_spark.query import simple_query_string_search

    reader, oracle = setup
    # well-formed input: identical to query_string
    a = [tuple(r) for r in simple_query_string_search(reader, "error AND timeout", k=10).collect()]
    b = [
        ((r[0], r[1]), r[2])
        for r in a
    ]  # shape check only; parity below
    want = oracle.query_string("error AND timeout", k=10)
    assert [x[0] for x in b] == [w[0] for w in want]
    # malformed / unbalanced input must not raise and should return hits
    out = simple_query_string_search(reader, '((error "unclosed ~x^', k=10)
    assert out.count() >= 0


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_common_terms_rank_identical(setup, mode):
    """CommonTermsQuery (CommonTermsQueryParser.java): low-freq terms gate,
    high-freq terms only score; degenerates to plain OR with no low term."""
    from elasticsearch_spark.query import common_terms_search

    reader, oracle = setup
    cases = [
        ("tok0001 error retry", 0.2),     # tok0001 rare → required
        ("error timeout", 1.0),           # everything 'common' → plain OR
        ("tok0001 tok0002 error", 0.2),   # two rare gates (either suffices)
        ("zzz_absent error", 0.0001),     # absent low term drops out
    ]
    for text, cutoff in cases:
        got = [
            ((r["conv_id"], r["turn_idx"]), r["score"])
            for r in common_terms_search(
                reader, text, cutoff_frequency=cutoff, k=10, mode=mode
            ).collect()
        ]
        want = oracle.common_terms(text, cutoff_frequency=cutoff, k=10)
        assert [g[0] for g in got] == [w[0] for w in want], (text, cutoff, mode)
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) <= 1e-9 * max(1.0, abs(b)), (text, a, b)
