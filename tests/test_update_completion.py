"""Weighted/fuzzy completion + MERGE-shaped scripted update (round 3).

Reference semantics:
- index/mapper/core/CompletionFieldMapper.java:260-370 (input/output/
  weight/payload), search/suggest/completion/CompletionSuggestionFuzzyBuilder.java
  (fuzziness ONE, exact leading char, short prefixes exact).
- action/update/UpdateHelper.java (partial-doc merge, scripted update,
  doc_as_upsert).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elasticsearch_spark.ops.suggest import (
    build_completion_entries,
    completion_suggest_weighted,
)
from elasticsearch_spark.ops.update import merge_upsert


@pytest.fixture(scope="module")
def entries(spark):
    rows = [
        Row(title="Whiskey", pop=10, tag="a"),
        Row(title="Whiskey", pop=25, tag="b"),   # higher weight wins + payload
        Row(title="Whiskey", pop=25, tag="z"),   # weight tie -> lexic. max payload
        Row(title="Whisker", pop=5, tag="c"),
        Row(title="Wine", pop=99, tag="d"),
        Row(title="Water", pop=50, tag="e"),
    ]
    return build_completion_entries(
        spark.createDataFrame(rows),
        input_col="title",
        weight_col="pop",
        output_col="title",
        payload_col="tag",
    )


def test_completion_weight_order_and_payload(entries):
    got = completion_suggest_weighted(entries, "w", size=10).collect()
    assert [(r.completion, r.weight) for r in got] == [
        ("Wine", 99),
        ("Water", 50),
        ("Whiskey", 25),
        ("Whisker", 5),
    ]
    # dedup keeps max weight; weight tie broken by lexicographic payload
    by_name = {r.completion: r.payload for r in got}
    assert by_name["Whiskey"] == "z"
    assert by_name["Wine"] == "d"


def test_completion_prefix_prunes(entries):
    got = completion_suggest_weighted(entries, "whisk", size=10).collect()
    assert {r.completion for r in got} == {"Whiskey", "Whisker"}


def test_completion_fuzzy_prefix(entries):
    # "wjisk": first char exact, levenshtein("jisk","hisk")=1 <= fuzziness
    got = completion_suggest_weighted(entries, "wjisk", size=10, fuzziness=1).collect()
    assert {r.completion for r in got} == {"Whiskey", "Whisker"}
    # fuzziness=0 must not match the typo
    assert completion_suggest_weighted(entries, "wjisk", size=10).count() == 0


def test_completion_short_prefix_exact(entries):
    # prefixes under min_length are matched exactly even with fuzziness
    assert (
        completion_suggest_weighted(entries, "xi", size=10, fuzziness=2).count() == 0
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            Row(k=1, lang="en", n=10, extra="keep1"),
            Row(k=2, lang="de", n=20, extra="keep2"),
            Row(k=3, lang="fr", n=30, extra="keep3"),
        ]
    )


def test_partial_doc_merge(spark, corpus):
    batch = spark.createDataFrame([Row(k=2, lang="xx"), Row(k=9, lang="ins")])
    out = {r.k: r for r in merge_upsert(corpus, batch, ["k"]).collect()}
    assert set(out) == {1, 2, 3, 9}
    assert out[2].lang == "xx" and out[2].n == 20 and out[2].extra == "keep2"
    assert out[1].lang == "en"                       # untouched row unchanged
    assert out[9].lang == "ins" and out[9].n is None  # upserted partial doc


def test_partial_doc_null_does_not_clobber(spark, corpus):
    batch = spark.createDataFrame(
        [Row(k=1, lang=None, n=111)], schema="k int, lang string, n bigint"
    )
    out = {r.k: r for r in merge_upsert(corpus, batch, ["k"]).collect()}
    assert out[1].lang == "en" and out[1].n == 111  # null field leaves old value


def test_scripted_counter_and_no_upsert(spark, corpus):
    batch = spark.createDataFrame([Row(k=3, n=5), Row(k=7, n=5)])
    out = {
        r.k: r
        for r in merge_upsert(
            corpus,
            batch,
            ["k"],
            script={"n": lambda o, nw: o["n"] + nw["n"]},
            upsert=False,
        ).collect()
    }
    assert set(out) == {1, 2, 3}          # k=7 dropped without upsert
    assert out[3].n == 35                  # ctx._source counter increment
    assert out[1].n == 10 and out[2].n == 20  # script only touches batch rows


def test_update_broadcast_plan(spark, corpus):
    batch = spark.createDataFrame([Row(k=1, lang="xx")])
    plan = merge_upsert(corpus, batch, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
