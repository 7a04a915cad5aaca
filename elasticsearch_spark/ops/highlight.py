"""Highlighting (SURVEY.md §2.6).

Reference: search/highlight/PlainHighlighter.java (198 LoC) — re-analyze the
stored field, score fragments by matched-term count, wrap matches in tags.

Spark shape: pure JVM column expressions — a case-insensitive alternation of
the query terms, fragment = fixed char window centred on the first match,
matches wrapped in <em>/</em>. No Python in the plan; runs at scan speed on
the fetch-phase rows (k rows), or over a whole corpus for export pipelines.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PRE_TAG = "<em>"
POST_TAG = "</em>"


def _terms_rx(terms: list[str]) -> str:
    alts = "|".join(sorted((re.escape(t) for t in set(terms)), key=len, reverse=True))
    return f"(?i)\\b({alts})\\b"


def highlight_column(
    text_col: str | Column,
    terms: list[str],
    fragment_size: int = 100,
) -> Column:
    """First matching fragment with terms wrapped in <em> tags; NULL when no
    term matches."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    rx = _terms_rx(terms)
    frag = F.regexp_extract(
        col, f"(?s).{{0,{fragment_size // 2}}}{rx}.{{0,{fragment_size // 2}}}", 0
    )
    tagged = F.regexp_replace(frag, rx, f"{PRE_TAG}$1{POST_TAG}")
    return F.when(frag != "", tagged).otherwise(F.lit(None))


def n_matches_column(text_col: str | Column, terms: list[str]) -> Column:
    """Matched-term occurrence count (the fragment-scoring signal)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(col, F.lit(_terms_rx(terms)), F.lit(0)))


def highlight(
    df: DataFrame,
    text_col: str,
    terms: list[str],
    out_col: str = "highlight",
    fragment_size: int = 100,
) -> DataFrame:
    return df.withColumn(
        out_col, highlight_column(text_col, terms, fragment_size)
    )
