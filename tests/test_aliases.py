"""Named filtered aliases (index/aliases.py — IndexAliasesService.java
analog) and the single-query bounded-gather escape hatch
(query/executor.py:_GATHER_MAX_ROWS, ported from msearch in round 5)."""

import pytest

from elasticsearch_spark.config import IndexConfig
from elasticsearch_spark.fixtures import generate_transcripts
from elasticsearch_spark.index import IndexReader, build_index
from elasticsearch_spark.index.aliases import (
    alias_filter,
    delete_alias,
    list_aliases,
    put_alias,
)
from elasticsearch_spark.query.executor import search_topk

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def setup(spark, tmp_root):
    corpus = generate_transcripts(n_convs=60, seed=91)
    cfg = IndexConfig(stored_cols=("role", "tool"), n_partitions=6,
                      dedup_latest_by="ts")
    idx = f"{tmp_root}/idx_aliases"
    build_index(spark, spark.createDataFrame(corpus), idx, cfg)
    return IndexReader(spark, idx)


def _rows(df):
    return [
        ((r["conv_id"], r["turn_idx"]), round(r["score"], 6))
        for r in df.collect()
    ]


def test_alias_crud(setup):
    reader = setup
    put_alias(reader.index_dir, "assistant_turns", "role = 'assistant'")
    put_alias(reader.index_dir, "user_turns", "role = 'user'")
    assert list_aliases(reader.index_dir) == {
        "assistant_turns": "role = 'assistant'",
        "user_turns": "role = 'user'",
    }
    put_alias(reader.index_dir, "user_turns", "role = 'user' AND tool IS NULL")
    assert (
        list_aliases(reader.index_dir)["user_turns"]
        == "role = 'user' AND tool IS NULL"
    )
    delete_alias(reader.index_dir, "user_turns")
    assert sorted(list_aliases(reader.index_dir)) == ["assistant_turns"]
    with pytest.raises(KeyError):
        alias_filter(reader, "user_turns")
    # unparsable predicate: stored fine, fails at first use with the
    # parser error (F.expr defers analysis to plan time)
    put_alias(reader.index_dir, "bad", "role === '")
    with pytest.raises(Exception):
        search_topk(reader, "error", k=3, alias="bad").collect()
    delete_alias(reader.index_dir, "bad")


@pytest.mark.parametrize("mode", ["local", "spark"])
def test_search_through_alias_equals_inline_filter(setup, mode):
    reader = setup
    put_alias(reader.index_dir, "assistant_turns", "role = 'assistant'")
    via_alias = search_topk(
        reader, "error retry", k=10, alias="assistant_turns", mode=mode
    )
    inline = search_topk(
        reader, "error retry", k=10,
        filter_cond=F.col("role") == "assistant", mode=mode,
    )
    got, want = _rows(via_alias), _rows(inline)
    assert got == want and len(got) > 0


def test_alias_combines_with_request_filter(setup):
    reader = setup
    put_alias(reader.index_dir, "assistant_turns", "role = 'assistant'")
    via_alias = search_topk(
        reader, "error timeout", k=10, alias="assistant_turns",
        filter_cond=F.col("tool").isNotNull(),
    )
    inline = search_topk(
        reader, "error timeout", k=10,
        filter_cond=(F.col("role") == "assistant")
        & F.col("tool").isNotNull(),
    )
    assert _rows(via_alias) == _rows(inline)


def test_msearch_alias(setup):
    from elasticsearch_spark.query.msearch import msearch_topk

    reader = setup
    put_alias(reader.index_dir, "assistant_turns", "role = 'assistant'")
    out = msearch_topk(
        reader,
        [
            {"query_text": "error retry", "alias": "assistant_turns"},
            {"query_text": "error retry",
             "filter_cond": F.col("role") == "assistant"},
        ],
        k=10,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            ((r["conv_id"], r["turn_idx"]), round(r["score"], 6))
        )
    assert by_q[0] == by_q[1] and len(by_q[0]) > 0


def test_bounded_gather_hatch_identical(setup, monkeypatch):
    """Past the gather budget the rank() cut must keep exactly the rows
    the driver-side theta cut keeps — results identical either way."""
    import elasticsearch_spark.query.executor as ex

    reader = setup
    baseline = _rows(search_topk(reader, "error retry timeout", k=7,
                                 mode="spark"))
    monkeypatch.setattr(ex, "_GATHER_MAX_ROWS", 1)  # force the hatch
    hatched = _rows(search_topk(reader, "error retry timeout", k=7,
                                mode="spark"))
    assert hatched == baseline and len(baseline) == 7
