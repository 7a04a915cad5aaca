"""Join-shaped operators (SURVEY.md §2.4).

ES has exactly four restricted intra-shard join shapes; all require parent
and child routed to the same shard — the analog of co-partitioning both
sides on the parent key, which our engine gets by routing on conv_id.
Spark generalizes all of them to real joins; small sides are broadcast.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def has_child(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    child_cond: Column,
    score_mode: str = "none",
    score_col: Column | None = None,
) -> DataFrame:
    """HasChildQueryParser.java / ChildrenQuery.java (743 LoC): parents with
    ≥1 matching child. score modes none/avg/max/sum/count aggregate child
    scores onto the parent (ChildrenQuery hash-joins on _parent ordinals —
    here a semi/aggregate join on the key)."""
    hits = child.where(child_cond)
    if score_mode == "none":
        keys = hits.select(F.col(child_fk).alias(parent_key)).distinct()
        return parent.join(keys, parent_key, "left_semi")
    score = score_col if score_col is not None else F.lit(1.0)
    agg = {
        "avg": F.avg(score),
        "max": F.max(score),
        "sum": F.sum(score),
        "count": F.count(F.lit(1)),
    }[score_mode]
    child_scores = (
        hits.groupBy(F.col(child_fk).alias(parent_key))
        .agg(agg.alias("child_score"))
    )
    return parent.join(child_scores, parent_key, "inner")


def has_parent(
    child: DataFrame,
    parent: DataFrame,
    parent_key: str,
    child_fk: str,
    parent_cond: Column,
) -> DataFrame:
    """HasParentQueryParser.java / ParentQuery.java: children whose parent
    matches."""
    keys = parent.where(parent_cond).select(parent_key).distinct()
    return child.join(
        F.broadcast(keys.withColumnRenamed(parent_key, child_fk)),
        child_fk,
        "left_semi",
    )


def top_children(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    child_cond: Column,
    order: Sequence[Column],
    k_per_parent: int,
) -> DataFrame:
    """TopChildrenQueryParser.java: child-first — take top-N children per
    parent, then map to parents (window top-N then join)."""
    w = Window.partitionBy(child_fk).orderBy(*order)
    top = (
        child.where(child_cond)
        .withColumn("child_rank", F.row_number().over(w))
        .where(F.col("child_rank") <= k_per_parent)
    )
    return parent.join(
        top.select(F.col(child_fk).alias(parent_key)).distinct(), parent_key, "left_semi"
    )


def terms_lookup(
    df: DataFrame,
    col: str,
    lookup_df: DataFrame,
    lookup_key: Column,
    lookup_values_col: str,
) -> DataFrame:
    """TermsLookupFilterBuilder.java: fetch the term list from another
    document, then filter — a broadcast semi-join."""
    vals = (
        lookup_df.where(lookup_key)
        .select(F.explode(F.col(lookup_values_col)).alias(col))
        .distinct()
    )
    return df.join(F.broadcast(vals), col, "left_semi")


def children_agg(
    parent_hits: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    agg_fn,
) -> DataFrame:
    """ParentToChildrenAggregator.java (215 LoC): step from parent buckets
    into child docs, then aggregate — join + groupBy."""
    joined = child.join(
        parent_hits.select(F.col(parent_key).alias(child_fk)).distinct(),
        child_fk,
        "left_semi",
    )
    return agg_fn(joined)


def nested_any(df: DataFrame, array_col: str, pred_expr: str) -> DataFrame:
    """NestedQueryParser.java: parent matches if ≥1 nested sub-doc matches —
    F.exists over the array column (no explode, no shuffle)."""
    return df.where(F.expr(f"exists({array_col}, x -> {pred_expr})"))


def nested_score(
    df: DataFrame,
    array_col: str,
    pred_expr: str,
    score_expr: str,
    mode: str = "avg",
) -> DataFrame:
    """Nested with score_mode avg/sum/max/min/none over matching sub-docs
    (ES nested score modes) — higher-order array functions, zero shuffle."""
    matches = f"filter({array_col}, x -> {pred_expr})"
    scores = f"transform({matches}, x -> cast({score_expr} as double))"
    combine = {
        "sum": f"aggregate({scores}, cast(0.0 as double), (a, s) -> a + s)",
        "avg": (
            f"case when size({matches}) > 0 then "
            f"aggregate({scores}, cast(0.0 as double), (a, s) -> a + s) / size({matches}) "
            "else null end"
        ),
        "max": f"array_max({scores})",
        "min": f"array_min({scores})",
        "none": "cast(1.0 as double)",
    }[mode]
    return df.where(F.expr(f"size({matches}) > 0")).withColumn(
        "nested_score", F.expr(combine)
    )
