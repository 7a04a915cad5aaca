"""Query rescore (SURVEY.md §2.6).

Reference: search/rescore/QueryRescorer.java (313 LoC) — re-rank the top
``window_size`` docs of the primary query with a secondary query; combined
score = query_weight * primary + rescore_query_weight * secondary, with
score_mode total/multiply/avg/max/min; docs outside the window keep their
primary score; the full hit array is re-sorted by final score (Lucene
QueryRescorer.rescore sorts the combined TopDocs).

Spark shape (scale-safe): the window is cut with ``orderBy().limit()`` —
a TakeOrderedAndProject that keeps per-partition heaps of ``window_size``
rows — never a global row_number() Window, which would funnel the entire
candidate set through one task. Below-window rows join back via a broadcast
anti-join against the (tiny) window key set.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMBINE = {
    "total": lambda p, s: p + s,
    "multiply": lambda p, s: p * s,
    "avg": lambda p, s: (p + s) / 2.0,
    "max": lambda p, s: F.greatest(p, s),
    "min": lambda p, s: F.least(p, s),
}


def _split_window(
    hits: DataFrame,
    score_col: str,
    key_order: Sequence[str],
    window_size: int,
    tail: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(window, below) split on the primary order without a Window function.

    ``tail`` (defaults to ``hits``) is the frame the below-window rows are
    drawn from — pass a pre-bounded frame to keep the whole plan bounded."""
    order = [F.col(score_col).desc()] + [F.col(c).asc() for c in key_order]
    window = hits.orderBy(*order).limit(window_size)
    below = (tail if tail is not None else hits).join(
        F.broadcast(window.select(*key_order)), list(key_order), "left_anti"
    )
    return window, below


def _combined(
    window: DataFrame,
    score_col: str,
    secondary: Column,
    query_weight: float,
    rescore_query_weight: float,
    score_mode: str,
) -> DataFrame:
    combine = _COMBINE[score_mode]
    return window.withColumn(
        score_col,
        combine(
            F.col(score_col) * query_weight,
            secondary * rescore_query_weight,
        ),
    )


def rescore(
    hits: DataFrame,
    score_col: str,
    secondary: Column,
    key_order: Sequence[str],
    window_size: int = 10,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    score_mode: str = "total",
) -> DataFrame:
    """Re-rank the top ``window_size`` rows of ``hits``; return ALL rows
    ordered by the final score (Lucene QueryRescorer re-sorts the combined
    hit array). Rows below the window keep their primary score.

    ``hits`` must carry the primary score in ``score_col``; ``secondary`` is
    any column expression (a second scorer, a decay function, a model score).
    """
    window, below = _split_window(hits, score_col, key_order, window_size)
    rescored = _combined(
        window, score_col, secondary, query_weight, rescore_query_weight,
        score_mode,
    )
    out = rescored.unionByName(below.select(*rescored.columns))
    return out.orderBy(
        F.col(score_col).desc(), *[F.col(c).asc() for c in key_order]
    )


def rescore_topk(
    primary: DataFrame,
    score_col: str,
    secondary: Column,
    key_order: Sequence[str],
    window_size: int = 10,
    k: int = 10,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    score_mode: str = "total",
) -> DataFrame:
    """Top-k after rescoring — fully bounded plan for unbounded hit sets.

    Only the top ``window_size + k`` primary rows can appear in the final
    top-k: every other row is dominated by >= k kept below-window rows
    (primary order, scores untouched below the window), so the gather is
    a TakeOrderedAndProject of window_size + k rows, never the full hit set.
    """
    order = [F.col(score_col).desc()] + [F.col(c).asc() for c in key_order]
    top = primary.orderBy(*order).limit(window_size + k)
    window, below = _split_window(top, score_col, key_order, window_size, tail=top)
    rescored = _combined(
        window, score_col, secondary, query_weight, rescore_query_weight,
        score_mode,
    )
    out = rescored.unionByName(below.select(*rescored.columns))
    return out.orderBy(*order).limit(k)
