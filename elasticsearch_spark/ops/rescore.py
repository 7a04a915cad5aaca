"""Query rescore (SURVEY.md §2.6).

Reference: search/rescore/QueryRescorer.java (313 LoC) — re-rank the top
``window_size`` docs of the primary query with a secondary query; combined
score = query_weight * primary + rescore_query_weight * secondary, with
score_mode total/multiply/avg/max/min; docs outside the window keep their
primary score and primary order below the window.

Spark shape: window_size cut via row_number() over the primary order, then a
column expression for the combine — no shuffle beyond the primary top-k's
own sort (rescoring is a per-row expression on an already-small window).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_COMBINE = {
    "total": lambda p, s: p + s,
    "multiply": lambda p, s: p * s,
    "avg": lambda p, s: (p + s) / 2.0,
    "max": lambda p, s: F.greatest(p, s),
    "min": lambda p, s: F.least(p, s),
}


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
    """Re-rank the top ``window_size`` rows of ``hits``.

    ``hits`` must carry the primary score in ``score_col``; ``secondary`` is
    any column expression (a second scorer, a decay function, a model score).
    Rows below the window keep their primary score. Output ordered
    (new_score DESC, *key_order ASC).
    """
    combine = _COMBINE[score_mode]
    w = Window.orderBy(
        F.col(score_col).desc(), *[F.col(c).asc() for c in key_order]
    )
    ranked = hits.withColumn("__rank", F.row_number().over(w))
    rescored = ranked.withColumn(
        score_col,
        F.when(
            F.col("__rank") <= window_size,
            combine(
                F.col(score_col) * query_weight,
                secondary * rescore_query_weight,
            ),
        ).otherwise(F.col(score_col)),
    ).drop("__rank")
    return rescored.orderBy(
        F.col(score_col).desc(), *[F.col(c).asc() for c in key_order]
    )


def rescore_topk(
    primary: DataFrame,
    score_col: str,
    secondary: Column,
    key_order: Sequence[str],
    window_size: int = 10,
    k: int = 10,
    **kw,
) -> DataFrame:
    return rescore(
        primary, score_col, secondary, key_order, window_size, **kw
    ).limit(k)
