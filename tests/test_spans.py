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


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_span_term(setup, mode):
    reader, oracle = setup
    for term in ["error", "alpha", "tok0003"]:
        _check(
            spans.span_term_topk(reader, term, k=10, mode=mode),
            oracle.span_or([term], k=10),
            f"span_term({term})",
        )


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_span_or(setup, mode):
    reader, oracle = setup
    for terms in [
        ["error", "timeout"],
        ["alpha", "beta", "gamma"],
        ["tok0001", "zzz_absent"],
        ["retry", "retry"],  # duplicate clause: counted once
    ]:
        _check(
            spans.span_or_topk(reader, terms, k=10, mode=mode),
            oracle.span_or(terms, k=10),
            f"span_or({terms})",
        )


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_span_multi_prefix(setup, mode):
    reader, oracle = setup
    for prefix, cap in [("tok000", 50), ("tok00", 5), ("zzz", 50)]:
        exp = sorted(
            t for t in oracle.postings if t.startswith(prefix)
        )[:cap]
        got = spans.span_multi_topk(
            reader, prefix, kind="prefix", max_expansions=cap, k=10,
            mode=mode,
        )
        want = oracle.span_or(exp, k=10, pre_analyzed=True) if exp else []
        _check(got, want, f"span_multi_prefix({prefix})")


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_span_multi_wildcard(setup, mode):
    import fnmatch

    reader, oracle = setup
    for pat, cap in [("tok00?1", 50), ("tok*9", 8), ("q*", 50)]:
        exp = sorted(
            t for t in oracle.postings if fnmatch.fnmatchcase(t, pat)
        )[:cap]
        got = spans.span_multi_topk(
            reader, pat, kind="wildcard", max_expansions=cap, k=10,
            mode=mode,
        )
        want = oracle.span_or(exp, k=10, pre_analyzed=True) if exp else []
        _check(got, want, f"span_multi_wildcard({pat})")


# --- field_masking_span over two position-aligned indexes ------------------


@pytest.fixture(scope="module")
def masked_setup(spark, tmp_root):
    import pandas as pd

    from elasticsearch_spark.config import AnalyzerConfig

    docs = [
        (0, "merging tables while the scan runs"),
        (1, "merged scan output merges again"),
        (2, "the scan merges sorted tables"),
        (3, "no relevant words here at all"),
        (4, "merge scan merge scan merge scan"),
        (5, "scan first then merging later maybe"),
        (6, "merges merges merges scan"),
        (7, "scanned merging"),  # 'scanned' stems differently from 'scan'
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    base = dict(text_col="text", key_cols=("doc_id",), n_partitions=3)
    idx_raw = f"{tmp_root}/idx_mask_raw"
    idx_stem = f"{tmp_root}/idx_mask_stem"
    build_index(spark, df, idx_raw,
                IndexConfig(analyzer=AnalyzerConfig(kind="simple"), **base))
    build_index(
        spark, df, idx_stem,
        IndexConfig(
            analyzer=AnalyzerConfig(
                kind="simple", token_filters=("porter_stem",)
            ),
            **base,
        ),
    )
    return (IndexReader(spark, idx_raw), IndexReader(spark, idx_stem), docs)


def test_masked_indexes_aligned(masked_setup):
    """The field_masking contract: same rows + same key/routing/partition
    layout ⇒ identical (segment_id, local_doc_id) → doc_id maps."""
    raw, stem, _ = masked_setup
    a = {
        (r["segment_id"], r["local_doc_id"]): r["doc_id"]
        for r in raw.docs().collect()
    }
    b = {
        (r["segment_id"], r["local_doc_id"]): r["doc_id"]
        for r in stem.docs().collect()
    }
    assert a == b and len(a) == 8


def test_field_masking_span_near(masked_setup):
    from elasticsearch_spark.oracle import pymirror
    from elasticsearch_spark.query.spans import field_masking_span_near_topk

    raw, stem, docs = masked_setup
    cases = [
        # stemmed primary clause + raw masked clause, ordered
        ([("main", "merges"), ("masked", "scan")], 4, True),
        ([("main", "merging"), ("masked", "tables")], 2, True),
        # unordered pair
        ([("main", "merge"), ("masked", "scan")], 1, False),
    ]
    for clauses, slop, in_order in cases:
        out = field_masking_span_near_topk(
            stem, raw, clauses, slop=slop, in_order=in_order, k=10
        )
        got = [(r["doc_id"], r["score"]) for r in out.collect()]
        # mirror convention: main=raw text, masked=stemmed view
        flip = {"main": "masked", "masked": "main"}
        want = pymirror.masked_span_near_mirror(
            docs, [(flip[f], w) for f, w in clauses], slop=slop,
            in_order=in_order, k=10,
        )
        assert [g[0] for g in got] == [w[0] for w in want], (clauses, got, want)
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) <= 1e-9 * max(1.0, abs(b)), (clauses, a, b)
