"""End-to-end rank-identity: Spark index+query engine vs pure-Python oracle.

Mirrors the reference's test strategy (SURVEY.md §5): id-level rank asserts
(ElasticsearchAssertions.java:139-182) run across randomized shard counts
(ElasticsearchIntegrationTest.java:321-322) — here: partition counts {1, 4}.
"""

import pytest

from elasticsearch_spark.config import IndexConfig
from elasticsearch_spark.fixtures import generate_transcripts, reference_query_set
from elasticsearch_spark.index import IndexReader, build_index
from elasticsearch_spark.oracle import PyRefEngine
from elasticsearch_spark.query import search_topk

from pyspark.sql import functions as F

N_CONVS = 60  # tiny scale (unit tests)


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_convs=N_CONVS, seed=42)


@pytest.fixture(scope="module")
def oracle(corpus):
    eng = PyRefEngine()
    # keep-latest dedup, stable (conv_id, turn_idx) ordering
    latest = (
        corpus.sort_values(["conv_id", "turn_idx", "ts"])
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .last()
    )
    for r in latest.itertuples():
        eng.index(
            (r.conv_id, int(r.turn_idx)),
            r.text,
            role=r.role,
            tool=r.tool,
        )
    return eng


def _build(spark, corpus, tmp_root, n_partitions, name):
    cfg = IndexConfig(
        text_col="text",
        key_cols=("conv_id", "turn_idx"),
        stored_cols=("role", "tool", "ts"),
        n_partitions=n_partitions,
        dedup_latest_by="ts",
    )
    sdf = spark.createDataFrame(corpus)
    idx = f"{tmp_root}/idx_{name}"
    res = build_index(spark, sdf, idx, cfg)
    return IndexReader(spark, idx), res


@pytest.fixture(scope="module", params=[1, 4], ids=["p1", "p4"])
def reader(request, spark, corpus, tmp_root):
    r, _ = _build(spark, corpus, tmp_root, request.param, f"p{request.param}")
    return r


def _run_query(reader, q):
    filt = None
    f = q.get("filters") or {}
    conds = []
    if "role" in f:
        conds.append(F.col("role") == f["role"])
    if "tool" in f:
        conds.append(F.col("tool") == f["tool"])
    if "ts_min" in f:
        conds.append(F.col("ts") >= f["ts_min"])
    for c in conds:
        filt = c if filt is None else (filt & c)
    op = "and" if q["kind"] == "match_and" else "or"
    df = search_topk(
        reader,
        q["query_text"],
        k=q["k"],
        operator=op,
        minimum_should_match=q.get("minimum_should_match", 1),
        filter_cond=filt,
    )
    return [((r["conv_id"], r["turn_idx"]), r["score"]) for r in df.collect()]


def _oracle_query(oracle, q):
    f = q.get("filters") or {}

    def filter_fn(doc):
        if "role" in f and doc.get("role") != f["role"]:
            return False
        if "tool" in f and doc.get("tool") != f["tool"]:
            return False
        return True

    op = "and" if q["kind"] == "match_and" else "or"
    return oracle.match(
        q["query_text"],
        k=q["k"],
        operator=op,
        minimum_should_match=q.get("minimum_should_match", 1),
        filter_fn=filter_fn if ("role" in f or "tool" in f) else None,
    )


def test_reference_query_set_rank_identical(reader, oracle):
    queries = [
        q for q in reference_query_set() if "ts_min" not in (q.get("filters") or {})
    ]
    assert len(queries) >= 50
    failures = []
    for q in queries:
        got = _run_query(reader, q)
        want = _oracle_query(oracle, q)
        keys_got = [kv[0] for kv in got]
        keys_want = [kv[0] for kv in want]
        if keys_got != keys_want:
            failures.append((q["query_id"], q["query_text"], keys_got[:3], keys_want[:3]))
            continue
        for (kg, sg), (kw, sw) in zip(got, want):
            if abs(sg - sw) > 1e-9 * max(1.0, abs(sw)):
                failures.append((q["query_id"], "score", kg, sg, sw))
    assert not failures, failures[:5]


def test_stats_match_oracle(reader, oracle):
    assert reader.n_docs == oracle.n_docs
    assert abs(reader.avgdl - oracle.avgdl) < 1e-12


def test_pruning_equals_dense(reader):
    for text in ["error timeout retry", "tok0000 tok0001 tok0002", "error tok0500"]:
        a = search_topk(reader, text, k=10, use_pruning=True).collect()
        b = search_topk(reader, text, k=10, use_pruning=False).collect()
        assert [(r["conv_id"], r["turn_idx"], round(r["score"], 9)) for r in a] == [
            (r["conv_id"], r["turn_idx"], round(r["score"], 9)) for r in b
        ]


def test_local_mode_equals_spark_mode(reader):
    """Driver-local execution (pyarrow reads + shared numpy scorer) must be
    row/score-identical to the distributed cogroup path."""
    for text, kw in [
        ("error timeout", {}),
        ("tok0000 tok0001", {"operator": "and"}),
        ("error timeout retry", {"minimum_should_match": 2}),
        ("rareterm000", {}),
    ]:
        a = search_topk(reader, text, k=10, mode="local", **kw).collect()
        b = search_topk(reader, text, k=10, mode="spark", **kw).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], (text, kw)


def test_absent_term_zero_hits(reader):
    assert search_topk(reader, "zzz_absent_term").count() == 0
    assert search_topk(reader, "").count() == 0
    assert search_topk(reader, "error zzz_absent_term", operator="and").count() == 0
