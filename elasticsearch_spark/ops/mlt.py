"""more_like_this / fuzzy_like_this / common-terms (SURVEY.md §2.3).

Reference: index/query/MoreLikeThisQueryParser.java (307 LoC) +
index/search/morelikethis/ — extract the top TF-IDF terms from sample text
(or sample docs), then run them as a disjunctive query.
CommonTermsQueryParser.java (229 LoC) — split query terms at a doc-frequency
cutoff: low-freq terms are required (MUST), high-freq optional (SHOULD).
"""

from __future__ import annotations

import math
from collections import Counter

from elasticsearch_spark.analysis.analyzers import tokenize_text
from elasticsearch_spark.index.reader import IndexReader


def select_mlt_terms(
    reader: IndexReader,
    like_text: str,
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 1,
    max_doc_freq: int | None = None,
) -> list[str]:
    """Top tf·idf terms of the sample text against the index statistics
    (MoreLikeThis term selection)."""
    tokens = tokenize_text(like_text, reader.cfg.analyzer)
    tf = Counter(tokens)
    cand = [t for t, c in tf.items() if c >= min_term_freq]
    stats = reader.query_term_stats(cand)
    n = reader.n_docs
    scored = []
    for t in cand:
        df = stats.get(t, (0, 0))[0]
        if df < min_doc_freq or (max_doc_freq and df > max_doc_freq) or df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        scored.append((tf[t] * idf, t))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in scored[:max_query_terms]]


def more_like_this(
    reader: IndexReader,
    like_text: str,
    k: int = 10,
    max_query_terms: int = 25,
    minimum_should_match: int = 1,
):
    """MLT = term selection + disjunctive BM25 top-k. The selected terms
    are already dictionary terms, so they score directly via terms_topk —
    no analyzer round-trip that could re-stem or drop them."""
    from elasticsearch_spark.query.executor import terms_topk

    terms = select_mlt_terms(reader, like_text, max_query_terms)
    return terms_topk(
        reader, terms, k=k, minimum_should_match=minimum_should_match
    )


def fuzzy_like_this(
    reader: IndexReader,
    like_text: str,
    k: int = 10,
    fuzziness: int = 1,
    prefix_length: int = 0,
    max_query_terms: int = 25,
):
    """fuzzy_like_this (FuzzyLikeThisQueryParser, MoreLikeThisQueryParser.java
    sibling — reg. IndicesQueriesModule): analyze the sample text, expand
    EVERY term through the dictionary within ``fuzziness`` edits (optional
    required prefix), keep the ``max_query_terms`` highest-idf expansions
    (ties term ASC), then run them as one disjunctive BM25 query.

    The expansion is one Spark job: the (tiny) sample-term table broadcast
    against a single termstats scan with length-window + prefix pushdown
    before the levenshtein — never a scan per term.
    """
    from pyspark.sql import functions as F

    from elasticsearch_spark.query.executor import lucene_idf, terms_topk

    tokens = list(dict.fromkeys(tokenize_text(like_text, reader.cfg.analyzer)))
    if not tokens:
        from elasticsearch_spark.query.executor import _empty_result

        return _empty_result(reader, ())
    tok_df = reader.spark.createDataFrame([(t,) for t in tokens], "input string")
    cand = (
        reader.termstats()
        .crossJoin(F.broadcast(tok_df))
        .where(
            (F.length("term") >= F.length("input") - fuzziness)
            & (F.length("term") <= F.length("input") + fuzziness)
        )
    )
    if prefix_length > 0:
        cand = cand.where(
            F.substring("term", 1, prefix_length)
            == F.substring("input", 1, prefix_length)
        )
    # the max_query_terms highest-idf cut runs IN Spark: idf is strictly
    # decreasing in df, so (idf DESC, term ASC) == (df ASC, term ASC) — a
    # TakeOrderedAndProject over the pushed candidate scan, mirroring
    # fuzzy_search_topk's bounded rewrite (query/executor.py). Over a
    # 10^8-term dictionary a short sample term at fuzziness 2 can match
    # tens of thousands of terms; only the <= max_query_terms winners
    # ever reach the driver.
    rows = (
        cand.where(F.levenshtein(F.col("term"), F.col("input")) <= fuzziness)
        .select("term", "df")
        .distinct()
        .orderBy(F.col("df").asc(), F.col("term").asc())
        .limit(int(max_query_terms))
        .collect()
    )
    n = reader.n_docs
    scored = sorted(
        ((lucene_idf(n, r["df"]), r["term"]) for r in rows),
        key=lambda x: (-x[0], x[1]),
    )
    selected = [t for _, t in scored]
    if not selected:
        from elasticsearch_spark.query.executor import _empty_result

        return _empty_result(reader, ())
    # selected terms are dictionary terms — score them directly rather than
    # round-tripping through the analyzer (which could re-stem/drop them)
    return terms_topk(reader, selected, k=k)


def common_terms_split(
    reader: IndexReader, query_text: str, cutoff_frequency: float = 0.01
) -> tuple[list[str], list[str]]:
    """CommonTermsQuery: (low_freq MUST terms, high_freq SHOULD terms) split
    by df/N cutoff using the global term-stats table."""
    tokens = list(dict.fromkeys(tokenize_text(query_text, reader.cfg.analyzer)))
    stats = reader.query_term_stats(tokens)
    n = max(reader.n_docs, 1)
    low, high = [], []
    for t in tokens:
        df = stats.get(t, (0, 0))[0]
        (high if df / n > cutoff_frequency else low).append(t)
    return low, high
