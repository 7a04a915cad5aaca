"""Suggesters (SURVEY.md §2.6).

Reference: search/suggest/term/TermSuggester.java:41-54 — per input token,
DirectSpellChecker proposes dictionary terms within max_edits, ranked by
(score desc, doc_freq desc); search/suggest/phrase/PhraseSuggester.java —
candidate generation per token + language-model rerank.

Spark shape: the term dictionary IS a table (termstats), so suggestion is a
filtered scan: levenshtein() against the input, rank by (distance asc,
df desc, term asc). Candidate generation prunes the dictionary scan with
cheap SQL predicates (first-letter match or length window) before the
O(len²) edit-distance — on a cluster this is a narrow columnar scan of the
term-dict table, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elasticsearch_spark.analysis.analyzers import tokenize_text
from elasticsearch_spark.index.reader import IndexReader


def term_suggest_df(
    term_dict: DataFrame,
    input_term: str,
    max_edits: int = 2,
    size: int = 5,
    min_df: int = 1,
    prefix_len: int = 1,
) -> DataFrame:
    """Suggestions from a (term, df) dictionary table.

    Returns (suggestion, distance, df) ranked (distance ASC, df DESC,
    suggestion ASC), excluding the input term itself. ``prefix_len`` mirrors
    DirectSpellChecker's default 1-char prefix requirement (cheap pushdown
    predicate before levenshtein)."""
    t = input_term.lower()
    cand = term_dict.where(
        (F.length("term") >= len(t) - max_edits)
        & (F.length("term") <= len(t) + max_edits)
        & (F.col("df") >= min_df)
        & (F.col("term") != t)
    )
    if prefix_len > 0:
        cand = cand.where(
            F.col("term").startswith(t[:prefix_len])
        )
    return (
        cand.withColumn("distance", F.levenshtein(F.col("term"), F.lit(t)))
        .where(F.col("distance") <= max_edits)
        .select(F.col("term").alias("suggestion"), "distance", "df")
        .orderBy(
            F.col("distance").asc(), F.col("df").desc(), F.col("suggestion").asc()
        )
        .limit(size)
    )


def term_suggest(
    reader: IndexReader,
    text: str,
    max_edits: int = 2,
    size: int = 5,
    min_df: int = 1,
) -> dict[str, list[tuple[str, int, int]]]:
    """Per-token suggestions for a whole input string (the _suggest API
    shape): token -> [(suggestion, distance, df)]; exact dictionary hits
    return an empty suggestion list (nothing to correct)."""
    out: dict[str, list] = {}
    tokens = list(dict.fromkeys(tokenize_text(text, reader.cfg.analyzer)))
    stats = reader.query_term_stats(tokens)
    dict_df = reader.termstats()
    for tok in tokens:
        if stats.get(tok, (0, 0))[0] > 0:
            out[tok] = []
            continue
        rows = term_suggest_df(dict_df, tok, max_edits, size, min_df).collect()
        out[tok] = [(r["suggestion"], r["distance"], r["df"]) for r in rows]
    return out


def phrase_suggest(
    reader: IndexReader,
    text: str,
    max_edits: int = 2,
) -> str:
    """Whole-phrase correction: replace each unknown token with its best
    term suggestion (PhraseSuggester's shape without the LM rerank — the
    n-gram LM is a v2 item; candidate selection order matches term_suggest)."""
    tokens = tokenize_text(text, reader.cfg.analyzer)
    per_tok = term_suggest(reader, text, max_edits=max_edits, size=1)
    corrected = []
    for tok in tokens:
        sugg = per_tok.get(tok, [])
        corrected.append(sugg[0][0] if sugg else tok)
    return " ".join(corrected)
