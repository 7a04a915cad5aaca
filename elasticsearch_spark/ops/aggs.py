"""Aggregation operators (SURVEY.md §2.5).

Reference execution model: per-shard partial aggregators + coordinator
reduce (search/aggregations/AggregationPhase.java:79-126,
SearchPhaseController.java:366-376) — exactly Spark's partial/final hash
aggregation, so almost everything here is a groupBy().agg() built from
JVM-side functions (whole-stage codegen, no Python).

Sub-aggregation trees map to composed groupBys; `global` re-aggregates the
unfiltered frame (GlobalAggregator.java does a second match_all pass).
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _grouped(df: DataFrame, by: Sequence[str] | None):
    return df.groupBy(*by) if by else df.groupBy()


def stats(df: DataFrame, col: str, by: Sequence[str] | None = None) -> DataFrame:
    """StatsAggegator.java (164 LoC): count,min,max,sum,avg."""
    return _grouped(df, by).agg(
        F.count(col).alias("count"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.sum(col).alias("sum"),
        F.avg(col).alias("avg"),
    )


def extended_stats(df: DataFrame, col: str, by: Sequence[str] | None = None, sigma: float = 2.0) -> DataFrame:
    """ExtendedStatsAggregator.java: + sum_of_squares, variance, std dev,
    std-dev bounds (population moments, as the reference computes them)."""
    base = _grouped(df, by).agg(
        F.count(col).alias("count"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.sum(col).alias("sum"),
        F.avg(col).alias("avg"),
        F.sum(F.col(col) * F.col(col)).alias("sum_of_squares"),
        F.var_pop(col).alias("variance"),
        F.stddev_pop(col).alias("std_deviation"),
    )
    return base.withColumn(
        "std_deviation_bounds_upper", F.col("avg") + sigma * F.col("std_deviation")
    ).withColumn(
        "std_deviation_bounds_lower", F.col("avg") - sigma * F.col("std_deviation")
    )


def value_count(df: DataFrame, col: str, by: Sequence[str] | None = None) -> DataFrame:
    """ValueCountAggregator.java — count of values (nulls excluded)."""
    return _grouped(df, by).agg(F.count(col).alias("value_count"))


def percentile_ranks(
    df: DataFrame,
    col: str,
    values: Sequence[float],
    by: Sequence[str] | None = None,
) -> DataFrame:
    """PercentileRanksAggregator semantics: for each given value v, the
    percentage of observed values ≤ v (exact — the reference's T-Digest is an
    approximation of this)."""
    aggs = [
        (F.avg(F.when(F.col(col) <= float(v), 1.0).otherwise(0.0)) * 100.0).alias(
            f"rank_{str(v).replace('.', '_')}"
        )
        for v in values
    ]
    return _grouped(df, by).agg(*aggs)


def scripted_metric(
    df: DataFrame,
    by: Sequence[str],
    map_reduce_fn,
    schema: str,
) -> DataFrame:
    """ScriptedMetricAggregator.java (init/map/combine/reduce user scripts)
    → ``groupBy(...).applyInPandas``: the callable receives each group as a
    pandas DataFrame (map+combine fused — Spark feeds whole groups) and
    returns the reduced rows. Arrow-batched; no per-row Python."""
    return df.groupBy(*by).applyInPandas(map_reduce_fn, schema)


def cardinality(
    df: DataFrame, col: str, by: Sequence[str] | None = None, exact: bool = False, rsd: float = 0.01
) -> DataFrame:
    """CardinalityAggregator.java — HyperLogLog++ (precision 14 default,
    HyperLogLogPlusPlus.java:59). Spark's approx_count_distinct is also
    HLL++; rsd 0.01 ≈ precision 14. exact=True swaps in countDistinct
    (Spark can afford exactness; the reference cannot)."""
    agg = (
        F.countDistinct(col) if exact else F.approx_count_distinct(col, rsd)
    ).alias("cardinality")
    return _grouped(df, by).agg(agg)


def percentiles(
    df: DataFrame,
    col: str,
    percents: Sequence[float] = (1, 5, 25, 50, 75, 95, 99),
    by: Sequence[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """PercentilesAggregator.java — T-Digest (compression 100) in the
    reference. exact=True uses Spark's exact `percentile` (linear
    interpolation — SQL-oracle comparable); exact=False uses
    percentile_approx (GK sketch; values diverge slightly from T-Digest,
    documented divergence per SURVEY.md §2.5)."""
    fn = "percentile" if exact else "percentile_approx"
    aggs = [
        F.expr(f"{fn}({col}, {p / 100.0})").alias(f"p{str(p).replace('.', '_')}")
        for p in percents
    ]
    return _grouped(df, by).agg(*aggs)


def top_hits(
    df: DataFrame,
    by: Sequence[str],
    order: Sequence[Column],
    k: int = 3,
) -> DataFrame:
    """TopHitsAggregator.java — per-bucket top-k collector →
    Window.partitionBy(bucket).orderBy(...) + row_number ≤ k."""
    w = Window.partitionBy(*by).orderBy(*order)
    return (
        df.withColumn("hit_rank", F.row_number().over(w))
        .where(F.col("hit_rank") <= k)
    )


def terms_agg(
    df: DataFrame,
    col: str,
    size: int = 10,
    order_by: str = "count",
    ascending: bool = False,
    min_doc_count: int = 1,
) -> DataFrame:
    """GlobalOrdinalsStringTermsAggregator.java — top-N buckets by count.

    The reference approximates with per-shard `shard_size` queues and
    reports doc_count_error (BucketUtils.java:37-48, InternalTerms.java:
    90-106); Spark's full groupBy makes the result EXACT, so
    doc_count_error_upper_bound is always 0 here. Ties break on the term
    for determinism (InternalOrder tie-break analog)."""
    agg = df.groupBy(col).agg(F.count(F.lit(1)).alias("doc_count"))
    agg = agg.where(F.col("doc_count") >= min_doc_count)
    if order_by == "count":
        ordering = [
            F.col("doc_count").asc() if ascending else F.col("doc_count").desc(),
            F.col(col).asc(),
        ]
    else:  # _term
        ordering = [F.col(col).asc() if ascending else F.col(col).desc()]
    return agg.orderBy(*ordering).limit(size)


def terms_agg_subaggs(
    df: DataFrame,
    col: str,
    subs: dict[str, Column],
    order_by: str = "count",
    size: int = 10,
    ascending: bool = False,
    min_doc_count: int = 1,
) -> DataFrame:
    """terms agg with sub-aggregations per bucket, orderable BY a sub-agg —
    the reference's InternalOrder.Aggregation path (InternalOrder.java:43-94:
    `"order": {"avg_price": "desc"}`). One partial/final hash aggregation
    computes the bucket count and every sub-agg in the same pass (the same
    shape as the reference's sub-collector tree in one shard visit)."""
    agg = df.groupBy(col).agg(
        F.count(F.lit(1)).alias("doc_count"),
        *[c.alias(name) for name, c in subs.items()],
    )
    agg = agg.where(F.col("doc_count") >= min_doc_count)
    key = F.col("doc_count") if order_by == "count" else F.col(order_by)
    return agg.orderBy(
        key.asc() if ascending else key.desc(), F.col(col).asc()
    ).limit(size)


def histogram(df: DataFrame, col: str, interval: float, by: Sequence[str] | None = None) -> DataFrame:
    """HistogramAggregator.java — key = floor(value/interval)*interval."""
    key = (F.floor(F.col(col) / interval) * interval).alias("key")
    grp = [key, *(by or [])]
    return df.groupBy(*grp).agg(F.count(F.lit(1)).alias("doc_count"))


def date_histogram(df: DataFrame, ts_col: str, interval: str) -> DataFrame:
    """Date variant with calendar intervals → date_trunc.

    interval: 'year'|'quarter'|'month'|'week'|'day'|'hour'|'minute'."""
    return (
        df.groupBy(F.date_trunc(interval, F.col(ts_col)).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


def range_agg(
    df: DataFrame, col: str, ranges: Sequence[tuple], by: Sequence[str] | None = None
) -> DataFrame:
    """RangeAggregator.java — explicit [from, to) buckets; overlapping
    ranges allowed (a doc may land in several → explode of matches)."""
    buckets = []
    for lo, hi in ranges:
        label = f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(col) >= lo)
        if hi is not None:
            cond = cond & (F.col(col) < hi)
        buckets.append(F.when(cond, F.lit(label)))
    arr = F.array(*buckets)
    exploded = df.withColumn("range_key", F.explode(arr)).where(
        F.col("range_key").isNotNull()
    )
    grp = ["range_key", *(by or [])]
    return exploded.groupBy(*grp).agg(F.count(F.lit(1)).alias("doc_count"))


def ip_range_agg(
    df: DataFrame,
    col: str,
    ranges: Sequence,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """ipv4_range aggregation (bucket/range/ipv4/, IpFieldMapper.java:375):
    bucket a dotted-quad string column by [from, to) IP bounds.

    ``ranges`` entries are either ``(from_ip|None, to_ip|None)`` pairs or
    CIDR mask strings ("10.0.0.0/18" → the network's [lo, hi) span,
    IPv4RangeBuilder.cidrMaskToMinMax). Overlapping buckets allowed, like
    range_agg. The string→long conversion is a JVM-side expression, so the
    scan shape is identical to a numeric range agg at any scale.
    """
    from elasticsearch_spark.functions.ip import (
        cidr_range,
        ip_to_long,
        ip_to_long_col,
    )

    ipl = "__ip_long"
    base = df.withColumn(ipl, ip_to_long_col(col))
    buckets = []
    for r in ranges:
        if isinstance(r, str):
            lo, hi = cidr_range(r)
            label = r
        else:
            lo_ip, hi_ip = r
            lo = ip_to_long(lo_ip) if lo_ip is not None else None
            hi = ip_to_long(hi_ip) if hi_ip is not None else None
            label = f"{lo_ip or '*'}-{hi_ip or '*'}"
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(ipl) >= lo)
        if hi is not None:
            cond = cond & (F.col(ipl) < hi)
        buckets.append(F.when(cond, F.lit(label)))
    exploded = base.withColumn("range_key", F.explode(F.array(*buckets))).where(
        F.col("range_key").isNotNull()
    )
    grp = ["range_key", *(by or [])]
    return exploded.groupBy(*grp).agg(F.count(F.lit(1)).alias("doc_count"))


def filters_agg(df: DataFrame, named: Mapping[str, Column]) -> DataFrame:
    """FiltersAggregator.java — one row per named predicate bucket."""
    aggs = [
        F.sum(F.when(cond, 1).otherwise(0)).alias(name) for name, cond in named.items()
    ]
    return df.agg(*aggs)


def missing_agg(df: DataFrame, col: str) -> DataFrame:
    """MissingAggregator.java — docs lacking the field."""
    return df.where(F.col(col).isNull()).agg(F.count(F.lit(1)).alias("doc_count"))


def global_agg(df_unfiltered: DataFrame, agg_fn) -> DataFrame:
    """GlobalAggregator.java — escape the query filter: aggregate the
    unfiltered frame (caller passes the pre-filter DataFrame)."""
    return agg_fn(df_unfiltered)


def significant_terms(
    df: DataFrame,
    col: str,
    foreground: Column,
    size: int = 10,
    heuristic: str = "jlh",
    min_doc_count: int = 3,
) -> DataFrame:
    """GlobalOrdinalsSignificantTermsAggregator.java + heuristics
    (bucket/significant/heuristics/JLHScore.java, ChiSquare.java,
    MutualInformation.java, GND.java): terms over-represented in the
    foreground (hits) vs the background (whole corpus).

    All four heuristics use the exact reference formulas with the default
    parser flags (background_is_superset=true, include_negatives=false —
    NXYSignificanceHeuristic.NXYParser): the NXY contingency table is

        N11 = fg_count            N_1 = fg_total
        N10 = bg_count - fg_count N_0 = bg_total - fg_total
        N1_ = bg_count            N0_ = bg_total - bg_count
        N01 = fg_total - fg_count N00 = N0_ - N01      N = bg_total

    - jlh  (JLHScore.java:64-101): (fg% - bg%) · (fg% / bg%), 0 when the
      absolute change ≤ 0 (the bucket is scored 0, NOT dropped — it can
      still be returned when fewer than ``size`` buckets outrank it).
    - chi_square (ChiSquare.java:70-80): N·(N11·N00 - N01·N10)² /
      (N_1·N1_·N0_·N_0); include_negatives=false scores buckets where
      N11/N_1 < N10/N_0 as -Infinity (returned only to fill ``size``).
    - mutual_information (MutualInformation.java:73-113): Σ MI terms /
      ln 2, each term (Nxy/N)·ln(N·Nxy/(Nx_·N_y)) with the 0·log 0 = 0
      guard; NaN and the negative direction both map to -Infinity.
    - gnd (GND.java:75-96): exp(-(max(ln fx, ln fy) - ln fxy) /
      (ln N - min(ln fx, ln fy))) over fx=N1_, fy=N_1, fxy=N11; 0 on no
      co-occurrence, 1 on perfect co-occurrence.

    Division edges follow Java double semantics (x/0 = ±Inf, 0/0 = NaN —
    Spark SQL's double division yields NULL instead, so the zero-divisor
    branches are spelled out; see round-3 advice)."""
    tot = df.agg(
        F.count(F.lit(1)).alias("bg_total"),
        F.sum(F.when(foreground, 1).otherwise(0)).alias("fg_total"),
    )
    counts = df.groupBy(col).agg(
        F.count(F.lit(1)).alias("bg_count"),
        F.sum(F.when(foreground, 1).otherwise(0)).alias("fg_count"),
    )
    j = counts.crossJoin(F.broadcast(tot)).where(
        (F.col("fg_count") >= min_doc_count) & (F.col("bg_count") > 0)
    )
    # every NXY factor is double BEFORE any product: the reference's
    # Frequencies are doubles (ChiSquare.java), and long products like
    # N_1·N1_·N0_·N_0 exceed int64 around 1e5-count corpora — Spark
    # non-ANSI would wrap silently.
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n11 = d("fg_count")
    n_1 = d("fg_total")
    n1_ = d("bg_count")
    n = d("bg_total")
    n10 = n1_ - n11
    n_0 = n - n_1
    n0_ = n - n1_
    n01 = n_1 - n11
    n00 = n0_ - n01
    neg_inf = F.lit(float("-inf"))

    def jdiv(num, den):
        """Java double division: x/0 = ±Inf, 0/0 = NaN (Spark gives NULL)."""
        return F.when(den != 0, num / den).otherwise(
            F.when(num > 0, F.lit(float("inf")))
            .when(num < 0, neg_inf)
            .otherwise(F.lit(float("nan")))
        )

    # include_negatives=false: term rarer in the foreground than in the
    # rest of the background -> -Infinity (Java comparisons with NaN are
    # false, so both sides are NaN-guarded)
    lhs, rhs = jdiv(n11, n_1), jdiv(n10, n_0)
    negative_dir = (~F.isnan(lhs)) & (~F.isnan(rhs)) & (lhs < rhs)
    if heuristic == "jlh":
        fg_pct, bg_pct = n11 / n_1, n1_ / n
        score = F.when((n_1 == 0) | (n == 0), F.lit(0.0)).otherwise(
            F.when(fg_pct - bg_pct <= 0, F.lit(0.0)).otherwise(
                (fg_pct - bg_pct) * (fg_pct / bg_pct)
            )
        )
    elif heuristic == "chi_square":
        num = n * F.pow(n11 * n00 - n01 * n10, 2.0)
        score = F.when(negative_dir, neg_inf).otherwise(
            jdiv(num, n_1 * n1_ * n0_ * n_0)
        )
    elif heuristic == "mutual_information":
        def mi_term(nxy, nx_, n_y):
            # reference guard (numerator<1e-7 && factor<1e-7) == nxy == 0
            # for integral counts; nxy>0 implies nx_>0 and n_y>0
            return F.when(nxy <= 0, F.lit(0.0)).otherwise(
                (nxy / n) * F.log((n * nxy) / (nx_ * n_y))
            )

        raw = (
            mi_term(n00, n0_, n_0)
            + mi_term(n01, n0_, n_1)
            + mi_term(n10, n1_, n_0)
            + mi_term(n11, n1_, n_1)
        ) / math.log(2.0)
        score = F.when(
            negative_dir | F.isnan(raw) | raw.isNull(), neg_inf
        ).otherwise(raw)
    elif heuristic == "gnd":
        fx, fy, fxy = n1_, n_1, n11
        den = F.log(n) - F.least(F.log(fx), F.log(fy))
        score = (
            F.when(fxy == 0, F.lit(0.0))
            .when((fx == fy) & (fx == fxy), F.lit(1.0))
            # fx==N or fy==N: exp(-(positive)/0) = exp(-Inf) = 0 in Java
            .when(den == 0, F.lit(0.0))
            .otherwise(
                F.exp(
                    -(F.greatest(F.log(fx), F.log(fy)) - F.log(fxy)) / den
                )
            )
        )
    else:
        raise ValueError(f"unknown heuristic {heuristic}")
    out = j.withColumn("sig_score", score)
    return (
        out.orderBy(F.col("sig_score").desc(), F.col(col).asc())
        .limit(size)
        .select(col, "fg_count", "bg_count", "sig_score")
    )
