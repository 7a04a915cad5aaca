"""Score-shaping operators (SURVEY.md §2.3).

Reference: index/query/functionscore/FunctionScoreQueryParser.java (254 LoC)
+ common/lucene/search/function/FunctionScoreQuery.java — rescale a query's
score with weight / field_value_factor / decay functions and combine modes.
All pure column expressions here (JVM, codegen).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def weight(factor: float) -> Column:
    return F.lit(float(factor))


def field_value_factor(
    col: str, factor: float = 1.0, modifier: str = "none", missing: float = 1.0
) -> Column:
    """FieldValueFactorFunctionParser semantics: value*factor through a
    modifier (none|log1p|ln1p|sqrt|square|reciprocal)."""
    v = F.coalesce(F.col(col).cast("double"), F.lit(missing)) * factor
    return {
        "none": v,
        "log1p": F.log(v + 1.0) / math.log(10.0),
        "ln1p": F.log(v + 1.0),
        "sqrt": F.sqrt(v),
        "square": v * v,
        "reciprocal": 1.0 / v,
    }[modifier]


def decay(
    kind: str, col: str, origin, scale: float, offset: float = 0.0, decay_: float = 0.5
) -> Column:
    """DecayFunctionParser semantics (gauss/exp/linear):
    gauss: exp(-(max(0,|x-origin|-offset))² / (2σ²)), σ² = -scale²/(2 ln d)
    exp:   exp(λ·max(0,|x-origin|-offset)),        λ = ln(d)/scale
    linear: max(0, (s - dist)/s),                   s = scale/(1-d)
    """
    dist = F.greatest(F.abs(F.col(col) - origin) - offset, F.lit(0.0))
    if kind == "gauss":
        sigma2 = -(scale**2) / (2.0 * math.log(decay_))
        return F.exp(-(dist * dist) / (2.0 * sigma2))
    if kind == "exp":
        lam = math.log(decay_) / scale
        return F.exp(lam * dist)
    if kind == "linear":
        s = scale / (1.0 - decay_)
        return F.greatest((s - dist) / s, F.lit(0.0))
    raise ValueError(kind)


def function_score(
    df: DataFrame,
    score_col: str,
    functions: Sequence[Column],
    score_mode: str = "multiply",
    boost_mode: str = "multiply",
) -> DataFrame:
    """Combine function values (score_mode) then combine with the query
    score (boost_mode) — FunctionScoreQuery.java combine modes."""
    if not functions:
        return df
    fs = functions[0]
    for f in functions[1:]:
        fs = {
            "multiply": fs * f,
            "sum": fs + f,
            "max": F.greatest(fs, f),
            "min": F.least(fs, f),
            "avg": fs + f,  # divided below
        }[score_mode]
    if score_mode == "avg":
        fs = fs / float(len(functions))
    q = F.col(score_col)
    new = {
        "multiply": q * fs,
        "sum": q + fs,
        "max": F.greatest(q, fs),
        "min": F.least(q, fs),
        "replace": fs,
        "avg": (q + fs) / 2.0,
    }[boost_mode]
    return df.withColumn(score_col, new)


def dis_max(score_cols: Sequence[Column], tie_breaker: float = 0.0) -> Column:
    """DisMaxQueryParser.java: max of subquery scores + tie_breaker * rest."""
    best = F.greatest(*score_cols) if len(score_cols) > 1 else score_cols[0]
    if tie_breaker == 0.0:
        return best
    total = score_cols[0]
    for c in score_cols[1:]:
        total = total + c
    return best + tie_breaker * (total - best)


def constant_score(df: DataFrame, cond: Column, boost: float = 1.0) -> DataFrame:
    """ConstantScoreQueryParser.java: filter, fixed score."""
    return df.where(cond).withColumn("score", F.lit(float(boost)))


def boosting(
    df: DataFrame, score_col: str, negative_cond: Column, negative_boost: float
) -> DataFrame:
    """BoostingQueryParser.java: demote (not exclude) matches of the
    negative query by multiplying their score."""
    return df.withColumn(
        score_col,
        F.when(negative_cond, F.col(score_col) * negative_boost).otherwise(
            F.col(score_col)
        ),
    )
