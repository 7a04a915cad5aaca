"""Filter operators — non-scoring predicates (SURVEY.md §2.2).

Reference registrations: /root/reference/src/main/java/org/elasticsearch/
indices/query/IndicesQueriesModule.java:118-148. ES filters are cached
bitsets; in Spark they are Column predicates Catalyst pushes into the scan
(the better analog of the filter cache is parquet row-group pruning).
Boolean composition mirrors XBooleanFilter/AndFilter/OrFilter/NotFilter
(common/lucene/search/XBooleanFilter.java:49 etc.).
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def term(col: str, value) -> Column:
    """TermFilterParser.java — exact value match, no analysis."""
    return F.col(col) == F.lit(value)


def terms(col: str, values: Iterable) -> Column:
    """TermsFilterParser.java — OR of exact values."""
    return F.col(col).isin(list(values))


def range_(col: str, gte=None, gt=None, lte=None, lt=None) -> Column:
    """RangeFilterParser.java — numeric/date/term range."""
    cond = F.lit(True)
    c = F.col(col)
    if gte is not None:
        cond = cond & (c >= gte)
    if gt is not None:
        cond = cond & (c > gt)
    if lte is not None:
        cond = cond & (c <= lte)
    if lt is not None:
        cond = cond & (c < lt)
    return cond


def exists(col: str) -> Column:
    """ExistsFilterParser.java (via _field_names) — field has a value."""
    return F.col(col).isNotNull()


def missing(col: str) -> Column:
    """MissingFilterParser.java — field has no value."""
    return F.col(col).isNull()


def ids(key_col: str, values: Sequence) -> Column:
    """IdsQueryParser.java — by document id."""
    return F.col(key_col).isin(list(values))


def prefix(col: str, value: str) -> Column:
    """PrefixQueryParser.java — term-dict prefix scan analog."""
    return F.col(col).startswith(value)


def wildcard(col: str, pattern: str) -> Column:
    """WildcardQueryParser.java — `*` any, `?` single char."""
    rx = "^" + re.escape(pattern).replace(r"\*", ".*").replace(r"\?", ".") + "$"
    return F.col(col).rlike(rx)


def regexp(col: str, pattern: str) -> Column:
    """RegexpQueryParser.java — anchored regex over the whole term."""
    return F.col(col).rlike(f"^(?:{pattern})$")


def bool_(
    must: Sequence[Column] = (),
    should: Sequence[Column] = (),
    must_not: Sequence[Column] = (),
    minimum_should_match: int = 1,
) -> Column:
    """BoolFilterParser.java — bitset intersect/union/negate.

    should with minimum_should_match=m: at least m of the clauses hold
    (sum of matched flags >= m, SURVEY.md §2.8).
    """
    cond = F.lit(True)
    for c in must:
        cond = cond & c
    for c in must_not:
        cond = cond & ~F.coalesce(c, F.lit(False))
    if should:
        flags = sum(
            (F.when(F.coalesce(c, F.lit(False)), 1).otherwise(0) for c in should),
            F.lit(0),
        )
        cond = cond & (flags >= minimum_should_match)
    return cond


def and_(*conds: Column) -> Column:
    """AndFilterParser.java."""
    out = F.lit(True)
    for c in conds:
        out = out & c
    return out


def or_(*conds: Column) -> Column:
    """OrFilterParser.java."""
    out = F.lit(False)
    for c in conds:
        out = out | c
    return out


def not_(cond: Column) -> Column:
    """NotFilterParser.java — NULL predicate counts as non-match."""
    return ~F.coalesce(cond, F.lit(False))


def limit_per_partition(df: DataFrame, n: int) -> DataFrame:
    """LimitFilterParser.java / terminate_after — early termination at n docs
    per partition (mapInPandas early-exit; no shuffle)."""
    import pandas as pd

    def take(batches):
        left = n
        for b in batches:
            if left <= 0:
                break
            out = b.iloc[:left]
            left -= len(out)
            yield out

    return df.mapInPandas(take, df.schema)


def fuzzy_terms(term_dict: DataFrame, term_col: str, query: str, fuzziness: int = 2) -> DataFrame:
    """FuzzyQueryParser.java — Levenshtein expansion over the term dictionary
    (the MultiTermQuery rewrite step, QueryParsers.java): returns matching
    terms; caller unions their postings / uses isin."""
    return term_dict.where(F.levenshtein(F.col(term_col), F.lit(query)) <= fuzziness)


def ttl_live(ts_col: str, now, ttl_seconds: int) -> Column:
    """TTL liveness predicate (_ttl field semantics — indices/ttl/
    IndicesTTLService.java purges docs whose _ttl elapsed): a doc is live
    while ts + ttl > now. Partition/row-group pruning applies when the
    table is laid out by time, so expiry scans read only the boundary
    window; actual deletion is the table-layout operation (rewrite or
    Iceberg delete) over ~ttl_expired rows."""
    return F.col(ts_col) + F.expr(f"INTERVAL {int(ttl_seconds)} SECONDS") > F.lit(now)


def ttl_expired(ts_col: str, now, ttl_seconds: int) -> Column:
    """Complement of ttl_live — the purge set."""
    return ~ttl_live(ts_col, now, ttl_seconds)


def ttl_expiry_plan(
    df: DataFrame,
    ts_col: str,
    now,
    ttl_seconds: int,
    bucket: str = "day",
) -> DataFrame:
    """Per-time-partition TTL expiry plan — the purge job's first pass
    (indices/ttl/IndicesTTLService.java runs a periodic purge; at table
    scale purging is a partition-layout operation, not per-doc deletes).

    Classifies each ``bucket`` (the table's time-partition grain) as:
      drop    — every row expired: a metadata-only partition delete,
      keep    — every row live: untouched, no IO,
      rewrite — boundary partition: rewrite only this one, keeping live rows.

    At 100 TB a 10-day TTL over day partitions touches ONE rewrite
    partition per run; everything else is metadata (drop) or skipped
    (keep) — the scan below is a single map-side groupBy on the partition
    key, no shuffle wider than the partition count."""
    live = ttl_live(ts_col, now, ttl_seconds)
    return (
        df.groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket"))
        .agg(
            F.sum(F.when(live, 1).otherwise(0)).alias("live_rows"),
            F.count(F.lit(1)).alias("total_rows"),
        )
        .withColumn(
            "action",
            F.when(F.col("live_rows") == 0, F.lit("drop"))
            .when(F.col("live_rows") == F.col("total_rows"), F.lit("keep"))
            .otherwise(F.lit("rewrite")),
        )
        .select("bucket", "action", "live_rows", "total_rows")
    )


def ttl_rebuild(
    df: DataFrame, ts_col: str, now, ttl_seconds: int, bucket: str = "day"
) -> DataFrame:
    """Execute the expiry: rows of 'keep' partitions pass through untouched
    (no rewrite at the storage layer); 'rewrite' partitions are filtered to
    live rows; 'drop' partitions vanish. Row-level result == ttl_live
    filter — the plan split exists so the writer can target only the
    boundary partitions."""
    return df.where(ttl_live(ts_col, now, ttl_seconds))
