"""_explain API: per-term breakdown consistency.

- indexed and online paths produce identical rows;
- contributions sum to the doc's actual search score.
Reference: action/explain/TransportExplainAction.java (Explanation tree).
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from elasticsearch_spark.config import IndexConfig
from elasticsearch_spark.fixtures import generate_transcripts
from elasticsearch_spark.index import IndexReader, build_index
from elasticsearch_spark.query import search_topk
from elasticsearch_spark.query.explain import explain_indexed, explain_online

QUERY = "tok0001 tok0040 tok0007"


@pytest.fixture(scope="module")
def ctx(spark, tmp_root):
    corpus = generate_transcripts(n_convs=60, seed=42)
    cfg = IndexConfig(
        text_col="text",
        key_cols=("conv_id", "turn_idx"),
        stored_cols=("role", "tool", "ts"),
        n_partitions=4,
        dedup_latest_by="ts",
    )
    sdf = spark.createDataFrame(corpus)
    build_index(spark, sdf, f"{tmp_root}/explain_idx", cfg)
    reader = IndexReader(spark, f"{tmp_root}/explain_idx")
    # keep-latest view of the raw table == what the index holds
    latest = (
        sdf.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("conv_id", "turn_idx").orderBy(F.col("ts").desc())
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    top = search_topk(reader, QUERY, k=1).collect()[0]
    return reader, latest, top


def test_contributions_sum_to_score(ctx):
    reader, latest, top = ctx
    cond = (F.col("conv_id") == top["conv_id"]) & (
        F.col("turn_idx") == top["turn_idx"]
    )
    br = explain_indexed(reader, QUERY, cond)
    assert len(br) >= 1
    assert br["contribution"].sum() == pytest.approx(top["score"], rel=1e-9)


def test_indexed_matches_online(ctx):
    reader, latest, top = ctx
    cond = (F.col("conv_id") == top["conv_id"]) & (
        F.col("turn_idx") == top["turn_idx"]
    )
    idx = explain_indexed(reader, QUERY, cond).sort_values("term").reset_index(drop=True)
    onl = (
        explain_online(
            reader.spark,
            latest,
            QUERY,
            key_cols=["conv_id", "turn_idx"],
            doc_cond=cond,
            analyzer=reader.cfg.analyzer,
            bm25=reader.cfg.bm25,
        )
        .orderBy("term")
        .toPandas()
    )
    assert list(idx["term"]) == list(onl["term"])
    assert list(idx["tf"]) == list(onl["tf"].astype(int))
    assert list(idx["df"]) == list(onl["df"].astype(int))
    for col in ("idf", "tfn", "contribution"):
        for a, b in zip(idx[col], onl[col]):
            assert a == pytest.approx(b, rel=1e-9)


def test_explain_missing_doc_and_empty_query(ctx):
    reader, latest, top = ctx
    cond = F.col("conv_id") == "no_such_conv"
    assert len(explain_indexed(reader, QUERY, cond)) == 0
    assert len(explain_indexed(reader, "", F.lit(True))) == 0
