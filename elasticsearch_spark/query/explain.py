"""_explain API — per-term score breakdown for one document.

Reference: action/explain/TransportExplainAction.java runs the query's
scorer against a single doc and returns Lucene's Explanation tree:
weight(field:term in doc) = idf * tfn per matched term, summed. The
relational analog here is one row per matched query term:

    (<keys...>, term, tf, df, idf, tfn, contribution)

with ``score = sum(contribution)`` exactly equal to what search_topk /
bm25_topk_online scores the doc.

Two paths, same numbers:

- ``explain_online``: Catalyst program over the raw table — the per-term
  rows are the ``_term_scores`` intermediate the match scorer aggregates
  away, restricted to one doc. SQL-expressible end to end (the registry
  oracle mirrors it in DuckDB).
- ``explain_indexed``: resolves the doc's (segment, local_id), reads only
  the query terms' postings in THAT segment (term + segment pruned scan)
  plus the vocabulary-sized global stats — a few tiny lookups, no corpus
  scan; the production path when an index exists.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from elasticsearch_spark.analysis.analyzers import tokenize_text
from elasticsearch_spark.config import AnalyzerConfig, BM25Params
from elasticsearch_spark.functions.smallfloat import effective_doc_length
from elasticsearch_spark.query.online import _term_scores

_EXPLAIN_COLS = ("term", "tf", "df", "idf", "tfn", "contribution")


def explain_online(
    spark: SparkSession,
    df: DataFrame,
    query_text: str,
    key_cols: Sequence[str],
    doc_cond: Column,
    text_col: str = "text",
    analyzer: AnalyzerConfig | None = None,
    bm25: BM25Params | None = None,
) -> DataFrame:
    """Per-term breakdown for the doc(s) matching ``doc_cond``.

    Statistics (df, avgdl, N) are corpus-global — identical to what the
    query would use — only the final per-term rows are filtered to the
    explained doc, so the numbers equal the doc's actual search score
    decomposition.
    """
    analyzer = analyzer or AnalyzerConfig(kind="simple")
    bm25 = bm25 or BM25Params()
    toks = tokenize_text(query_text, analyzer)
    uniq = list(dict.fromkeys(toks))
    if not uniq:
        return spark.createDataFrame(
            [], _explain_schema(df, key_cols)
        )
    mult = {t: toks.count(t) for t in uniq}
    scored = _term_scores(
        spark, df, uniq, mult, key_cols, text_col, analyzer, bm25
    )
    # doc_cond references original table columns; bring them via the keys
    keys = list(key_cols)
    target = df.where(doc_cond).select(*keys).distinct()
    return (
        scored.join(F.broadcast(target), keys)
        .select(
            *keys,
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "idf",
            "tfn",
            F.col("term_score").alias("contribution"),
        )
        .orderBy(*keys, "term")
    )


def explain_indexed(
    reader,
    query_text: str,
    doc_cond: Column,
) -> pd.DataFrame:
    """Index-backed breakdown: (keys..., term, tf, df, idf, tfn,
    contribution) as a pandas frame (single-doc API — driver-sized by
    construction, like the reference's single-shard explain).

    Reads: one row from docs (the key lookup), the query terms' postings
    in that doc's segment only, that segment's norms row, and the global
    term stats — nothing corpus-sized.
    """
    from elasticsearch_spark.query.executor import _decode_term, lucene_idf

    cfg = reader.cfg
    keys = list(cfg.key_cols)
    toks = tokenize_text(query_text, cfg.analyzer)
    uniq = list(dict.fromkeys(toks))
    out_cols = [*keys, *_EXPLAIN_COLS]
    empty = pd.DataFrame({c: [] for c in out_cols})
    if not uniq:
        return empty

    loc = (
        reader.docs()
        .where(doc_cond)
        .select("segment_id", "local_doc_id", *keys)
        .collect()
    )
    if not loc:
        return empty

    stats = reader.query_term_stats(uniq)
    n = reader.n_docs
    mult = {t: toks.count(t) for t in uniq}
    present = [t for t in uniq if stats.get(t, (0, 0))[0] > 0]
    if not present:
        return empty

    k1, b, quantize = cfg.bm25.k1, cfg.bm25.b, cfg.bm25.quantize_norms
    avgdl = reader.avgdl
    rows = []
    # tombstoned docs can never be hits (every scorer masks them), so the
    # reference's explain reports them as not-found — mirror that here
    # instead of fabricating a score breakdown for a deleted doc
    from elasticsearch_spark.index import deletes as _deletes

    any_deletes = _deletes.has_deletes(reader.index_dir)
    for doc_row in loc:
        seg, lid = doc_row["segment_id"], int(doc_row["local_doc_id"])
        if any_deletes and lid in _deletes.read_deletes(reader.index_dir, seg):
            continue
        norm = (
            reader.norms()
            .where(F.col("segment_id") == seg)
            .select("doc_len_packed")
            .collect()
        )
        doc_lens = np.frombuffer(norm[0]["doc_len_packed"], dtype=np.uint32)
        dl_eff = float(effective_doc_length(doc_lens, quantize=quantize)[lid])
        post = (
            reader.postings()
            .where((F.col("term").isin(present)) & (F.col("segment_id") == seg))
            .toPandas()
        )
        for t, g in post.groupby("term", sort=True):
            docs, tfs = _decode_term(g)
            hit = np.flatnonzero(docs == lid)
            if hit.size == 0:
                continue
            tf = float(tfs[hit[0]])
            df_t = stats[t][0]
            idf = lucene_idf(n, df_t)
            tfn = (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b) + k1 * b * dl_eff / avgdl)
            rows.append(
                {
                    **{k: doc_row[k] for k in keys},
                    "term": t,
                    "tf": int(tf),
                    "df": int(df_t),
                    "idf": idf,
                    "tfn": tfn,
                    "contribution": mult[t] * idf * tfn,
                }
            )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=out_cols)


def _explain_schema(df: DataFrame, key_cols: Sequence[str]):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    base = {f.name: f.dataType for f in df.schema.fields}
    fields = [StructField(k, base[k]) for k in key_cols]
    fields += [
        StructField("term", StringType()),
        StructField("tf", LongType()),
        StructField("df", LongType()),
        StructField("idf", DoubleType()),
        StructField("tfn", DoubleType()),
        StructField("contribution", DoubleType()),
    ]
    return StructType(fields)
