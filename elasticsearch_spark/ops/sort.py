"""Sort / pagination operators (SURVEY.md §2.6-§2.7).

Reference: search/sort/SortParseElement.java:54-185 (missing first/last,
multi-value modes via MultiValueMode.java), FromParseElement/
SizeParseElement (from+size), QueryPhase.java:118-141 (search_after),
MinScoreParseElement (score floor).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sort_key(
    col: str,
    ascending: bool = True,
    missing: str = "last",
    mode: str | None = None,
) -> Column:
    """Field sort with missing-value placement and multi-value mode.

    mode (for array columns): min/max/avg/sum — MultiValueMode.java."""
    c = F.col(col)
    if mode:
        c = {
            "min": F.array_min(c),
            "max": F.array_max(c),
            "avg": F.expr(
                f"aggregate({col}, cast(0.0 as double), (a, x) -> a + x) / size({col})"
            ),
            "sum": F.expr(f"aggregate({col}, cast(0.0 as double), (a, x) -> a + x)"),
        }[mode]
    key = c.asc() if ascending else c.desc()
    if missing == "last":
        key = c.asc_nulls_last() if ascending else c.desc_nulls_last()
    elif missing == "first":
        key = c.asc_nulls_first() if ascending else c.desc_nulls_first()
    return key


def from_size(df: DataFrame, order: Sequence[Column], from_: int, size: int) -> DataFrame:
    """from+size pagination: fetch from+size then slice — exactly what each
    ES shard does (QueryPhase.java:108). The slice uses a row_number so the
    plan stays distributed (no collect)."""
    w = Window.orderBy(*order)
    return (
        df.orderBy(*order)
        .limit(from_ + size)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > from_)
        .drop("__rn")
    )


def search_after(
    df: DataFrame,
    order_cols: Sequence[tuple[str, bool]],
    last_values: Sequence,
    size: int,
) -> DataFrame:
    """Keyset pagination — searchAfter(lastEmittedDoc) analog
    (ScanContext.java:47, SearchPhaseController.getLastEmittedDocPerShard).

    order_cols: [(col, ascending)]; last_values: the sort values of the last
    emitted row. Strictly-after predicate in lexicographic order.
    """
    after = F.lit(False)
    eq = F.lit(True)
    for (col, asc), lv in zip(order_cols, last_values):
        c = F.col(col)
        strict = (c > lv) if asc else (c < lv)
        after = after | (eq & strict)
        eq = eq & (c == lv)
    order = [F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_cols]
    return df.where(after).orderBy(*order).limit(size)


def min_score(df: DataFrame, score_col: str, threshold: float) -> DataFrame:
    """MinScoreParseElement.java — score floor."""
    return df.where(F.col(score_col) >= threshold)
