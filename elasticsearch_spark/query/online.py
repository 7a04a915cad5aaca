"""Index-free BM25 top-k as a pure Catalyst DataFrame program.

Same scoring semantics as the indexed path (Lucene BM25, global DFS stats,
byte315 norm quantization) expressed entirely with built-in Spark SQL
expressions — tokenize (regexp), explode, two hash aggregations, one
broadcast join of per-term stats, top-k sort. Used for:

- cross-checking the segmented index engine (tests assert identical output);
- the DuckDB-oracle parity path in __spark_entry__ (the whole plan is
  ANSI-SQL-expressible when the analyzer is "simple"/"whitespace");
- ad-hoc scoring of small/ephemeral tables where building an index is not
  worth it (the reference has no such mode; Catalyst gives it for free).

The quantization joins a ≤256-row broadcast range table — no UDF at all for
SQL-expressible analyzers; "standard" swaps in the Arrow-batched tokenizer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from elasticsearch_spark.analysis.analyzers import tokenize_column, tokenize_text
from elasticsearch_spark.config import AnalyzerConfig, BM25Params
from elasticsearch_spark.functions.smallfloat import quantized_length_ranges

MAX_DL = 1 << 16


def _dl_eff_col(spark: SparkSession, df: DataFrame, quantize: bool) -> DataFrame:
    """Attach dl_eff via a broadcast join with the byte315 range table."""
    if not quantize:
        return df.withColumn("dl_eff", F.col("doc_len").cast("double"))
    ranges = spark.createDataFrame(
        quantized_length_ranges(MAX_DL), "lo long, hi long, dl_eff double"
    )
    joined = df.join(
        F.broadcast(ranges),
        (F.col("doc_len") >= F.col("lo")) & (F.col("doc_len") <= F.col("hi")),
        "left",
    ).drop("lo", "hi")
    return joined.withColumn("dl_eff", F.coalesce(F.col("dl_eff"), F.lit(0.0)))


def _term_scores(
    spark: SparkSession,
    df: DataFrame,
    uniq_terms: list[str],
    mult: dict[str, int],
    key_cols: Sequence[str],
    text_col: str,
    analyzer: AnalyzerConfig,
    bm25: BM25Params,
) -> DataFrame:
    """Per-(doc, term) BM25 components for every doc containing any of
    uniq_terms: (keys..., term, tf, df, idf, tfn, term_score). The shared
    core of match scoring and the _explain API (which exposes these rows
    verbatim as the Explanation detail tree)."""
    keys = list(key_cols)
    toks = df.select(*keys, tokenize_column(text_col, analyzer).alias("toks"))
    docs = toks.withColumn("doc_len", F.size("toks"))
    docs = _dl_eff_col(spark, docs, bm25.quantize_norms)

    # global stats — one tiny aggregate row, broadcast via crossJoin
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_len").alias("total_tokens"),
    ).withColumn("avgdl", F.col("total_tokens") / F.col("n_docs"))

    hits = (
        docs.select(*keys, "dl_eff", F.explode("toks").alias("term"))
        .where(F.col("term").isin(uniq_terms))
        .groupBy(*keys, "dl_eff", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    termstats = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    mult_df = spark.createDataFrame(
        [(t, float(m)) for t, m in mult.items()], "term string, mult double"
    )
    scored = (
        hits.join(F.broadcast(termstats), "term")
        .join(F.broadcast(mult_df), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "tfn",
            (F.col("tf") * (bm25.k1 + 1.0))
            / (
                F.col("tf")
                + bm25.k1
                * (1.0 - bm25.b + bm25.b * F.col("dl_eff") / F.col("avgdl"))
            ),
        )
        .withColumn("term_score", F.col("mult") * F.col("idf") * F.col("tfn"))
    )
    return scored


def _bm25_scores(
    spark: SparkSession,
    df: DataFrame,
    uniq_terms: list[str],
    mult: dict[str, int],
    need: int,
    key_cols: Sequence[str],
    text_col: str,
    analyzer: AnalyzerConfig,
    bm25: BM25Params,
) -> DataFrame:
    """(keys..., score) for every doc matching ≥ need of uniq_terms — the
    shared scoring core of match / multi_match / fuzzy online queries."""
    keys = list(key_cols)
    scored = _term_scores(
        spark, df, uniq_terms, mult, key_cols, text_col, analyzer, bm25
    )
    per_doc = scored.groupBy(*keys).agg(
        F.sum("term_score").alias("score"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    return per_doc.where(F.col("n_terms_matched") >= need).drop("n_terms_matched")


def bm25_topk_online(
    spark: SparkSession,
    df: DataFrame,
    query_text: str,
    key_cols: Sequence[str],
    text_col: str = "text",
    k: int | None = 10,
    operator: str = "or",
    minimum_should_match: int = 1,
    analyzer: AnalyzerConfig | None = None,
    bm25: BM25Params | None = None,
    filter_cond: Column | None = None,
    score_decimals: int | None = None,
) -> DataFrame:
    """match-query BM25 top-k straight off the source table.

    Statistics (N, avgdl, per-term df) are computed over the FULL corpus;
    ``filter_cond`` only restricts the hit set (ES filter context — filters
    never change scoring statistics).
    Output: (*key_cols, score) ordered (score DESC, keys ASC), ≤ k rows.
    ``k=None`` returns the full (unordered) matching set — for callers that
    apply their own bounded cut (e.g. rescore_topk); never collect it raw.
    """
    analyzer = analyzer or AnalyzerConfig()
    bm25 = bm25 or BM25Params()
    keys = list(key_cols)

    q_tokens = tokenize_text(query_text, analyzer)
    uniq_terms = list(dict.fromkeys(q_tokens))
    if not uniq_terms:
        return df.select(*keys).withColumn("score", F.lit(0.0)).where(F.lit(False))
    need = len(uniq_terms) if operator == "and" else max(1, minimum_should_match)
    mult = {t: q_tokens.count(t) for t in uniq_terms}

    result = _bm25_scores(
        spark, df, uniq_terms, mult, need, keys, text_col, analyzer, bm25
    )
    if filter_cond is not None:
        keyed = df.where(filter_cond).select(*keys).distinct()
        result = result.join(keyed, keys, "left_semi")
    if score_decimals is not None:
        result = result.withColumn("score", F.round("score", score_decimals))
    if k is None:
        return result
    return result.orderBy(
        F.col("score").desc(), *[F.col(c).asc() for c in keys]
    ).limit(k)


def multi_match_online(
    spark: SparkSession,
    df: DataFrame,
    query_text: str,
    key_cols: Sequence[str],
    fields: Sequence[str],
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
    k: int = 10,
    analyzer: AnalyzerConfig | None = None,
    bm25: BM25Params | None = None,
    score_decimals: int | None = None,
) -> DataFrame:
    """multi_match over several fields (MultiMatchQuery.java semantics).

    best_fields: score = max(field scores) + tie_breaker · Σ(other fields)
    (Lucene DisjunctionMaxQuery); most_fields: score = Σ(field scores).
    Each field keeps its own statistics (df, avgdl) like per-field Lucene
    scoring.
    """
    analyzer = analyzer or AnalyzerConfig()
    bm25 = bm25 or BM25Params()
    keys = list(key_cols)
    q_tokens = tokenize_text(query_text, analyzer)
    uniq_terms = list(dict.fromkeys(q_tokens))
    if not uniq_terms:
        return df.select(*keys).withColumn("score", F.lit(0.0)).where(F.lit(False))
    mult = {t: q_tokens.count(t) for t in uniq_terms}

    # unpivot shape: per-field score rows union'd into one frame, then one
    # groupBy — both combine modes need only (max, sum) of the field scores,
    # so N fields cost one shuffle instead of N-1 full-outer joins (absent
    # fields simply contribute no row ≡ the old coalesce-to-0)
    per_field = [
        _bm25_scores(spark, df, uniq_terms, mult, 1, keys, field, analyzer, bm25)
        for field in fields
    ]
    un = per_field[0]
    for s in per_field[1:]:
        un = un.unionByName(s)
    agg = un.groupBy(*keys).agg(
        F.max("score").alias("__best"), F.sum("score").alias("__sum")
    )
    if match_type == "most_fields":
        total = F.col("__sum")
    else:  # best_fields
        total = F.col("__best") + tie_breaker * (F.col("__sum") - F.col("__best"))
    out = agg.withColumn("score", total).drop("__best", "__sum")
    if score_decimals is not None:
        out = out.withColumn("score", F.round("score", score_decimals))
    return out.orderBy(
        F.col("score").desc(), *[F.col(c).asc() for c in keys]
    ).limit(k)


def fuzzy_topk_online(
    spark: SparkSession,
    df: DataFrame,
    query_term: str,
    key_cols: Sequence[str],
    text_col: str = "text",
    fuzziness: int = 2,
    k: int = 10,
    analyzer: AnalyzerConfig | None = None,
    bm25: BM25Params | None = None,
    score_decimals: int | None = None,
) -> DataFrame:
    """fuzzy query: expand the term over the corpus token dictionary within
    ``fuzziness`` edits (FuzzyQueryParser.java — Levenshtein automaton over
    the term dict), then score the expansion as a disjunctive match query
    (each expanded term weighted by its own idf).
    """
    analyzer = analyzer or AnalyzerConfig()
    bm25 = bm25 or BM25Params()
    keys = list(key_cols)
    q = (tokenize_text(query_term, analyzer) or [""])[0]
    if not q:
        return df.select(*keys).withColumn("score", F.lit(0.0)).where(F.lit(False))

    dictionary = (
        df.select(F.explode(tokenize_column(text_col, analyzer)).alias("term"))
        .distinct()
        .where(
            (F.length("term") >= len(q) - fuzziness)
            & (F.length("term") <= len(q) + fuzziness)
            & (F.levenshtein(F.col("term"), F.lit(q)) <= fuzziness)
        )
    )
    expanded = sorted(r["term"] for r in dictionary.collect())
    if not expanded:
        return df.select(*keys).withColumn("score", F.lit(0.0)).where(F.lit(False))
    result = _bm25_scores(
        spark, df, expanded, {t: 1 for t in expanded}, 1, keys, text_col,
        analyzer, bm25,
    )
    if score_decimals is not None:
        result = result.withColumn("score", F.round("score", score_decimals))
    return result.orderBy(
        F.col("score").desc(), *[F.col(c).asc() for c in keys]
    ).limit(k)


def match_count(
    df: DataFrame,
    query_text: str,
    text_col: str = "text",
    analyzer: "AnalyzerConfig | None" = None,
    operator: str = "or",
    minimum_should_match: int = 1,
) -> DataFrame:
    """The `_count` API (rest/action/count/RestCountAction.java → count as a
    search with size=0): how many docs match, NO scoring, NO fetch phase.

    Pure JVM plan: tokenize_column (native SQL expr where the analyzer
    allows) + one array_intersect per row + a single count aggregate — one
    corpus scan, one 1-row reduction, nothing collected but the count."""
    from elasticsearch_spark.analysis.analyzers import tokenize_column, tokenize_text
    from elasticsearch_spark.config import AnalyzerConfig

    analyzer = analyzer or AnalyzerConfig(kind="simple")
    terms = list(dict.fromkeys(tokenize_text(query_text, analyzer)))
    if not terms:
        return df.sparkSession.createDataFrame([(0,)], "total long")
    need = len(terms) if operator == "and" else max(1, minimum_should_match)
    n_matched = F.size(
        F.array_intersect(
            F.array_distinct(tokenize_column(text_col, analyzer)),
            F.array(*[F.lit(t) for t in terms]),
        )
    )
    return df.where(n_matched >= need).agg(F.count(F.lit(1)).alias("total"))
