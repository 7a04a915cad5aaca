"""Percolator — reverse search: store queries, stream documents through them.

Reference: percolator/PercolatorService.java (844 LoC),
index/percolator/PercolatorQueriesRegistry.java — each incoming document is
matched against the registered query set; response lists matching query ids.

Spark shape: registered queries are parsed once (query/ast.py grammar subset:
term/bool/phrase clauses + keyword filters) and compiled to ONE boolean
Column each over the tokenized document — then a single narrow projection
evaluates every query per document batch, entirely JVM-side (codegen), no
Python and no join. For streaming, call ``percolate`` inside
``foreachBatch`` — the registered set rides along as literal expressions
(the broadcast-query-set pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elasticsearch_spark.analysis.analyzers import tokenize_column, tokenize_text
from elasticsearch_spark.config import AnalyzerConfig
from elasticsearch_spark.query.ast import ParsedQuery, parse_query_string


def _phrase_cond(toks_col: Column, words: list[str]) -> Column:
    """Exact-adjacency phrase containment over a token array (JVM lambda:
    any start offset where all words line up)."""
    n = len(words)
    arr = F.array(*[F.lit(w) for w in words])
    return F.exists(
        F.sequence(F.lit(0), F.greatest(F.size(toks_col) - n, F.lit(0))),
        lambda i: F.forall(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda j: toks_col[(i + j).cast("int")] == arr[j.cast("int")],
        ),
    )


def compile_query(pq: ParsedQuery, toks_col: Column) -> Column:
    """ParsedQuery → boolean Column over (tokens array, stored columns)."""
    must, should, must_not = [], [], []
    for c in pq.clauses:
        if c.phrase is not None:
            cond = _phrase_cond(toks_col, c.phrase)
        elif c.terms:
            cond = F.arrays_overlap(
                toks_col, F.array(*[F.lit(t) for t in c.terms])
            )
        else:
            continue
        {"must": must, "should": should, "must_not": must_not}[c.occur].append(cond)
    out = F.lit(True)
    for m in must:
        out = out & m
    if should and not must:
        s = should[0]
        for c in should[1:]:
            s = s | c
        out = out & s
    elif should:  # must present: should optional — no constraint
        pass
    for mn in must_not:
        out = out & ~mn
    fc = pq.filter_cond()
    if fc is not None:
        out = out & fc
    return out


def percolate(
    docs: DataFrame,
    queries: dict[str, str],
    text_col: str = "text",
    analyzer: AnalyzerConfig | None = None,
    filter_fields: set[str] = frozenset({"role", "tool", "conv_id", "ts"}),
) -> DataFrame:
    """Match every document against every registered query string.

    Returns (original columns…, matched_queries array<string>), rows with ≥1
    match only — the percolate API response shape.
    """
    analyzer = analyzer or AnalyzerConfig()
    toks = tokenize_column(text_col, analyzer)
    with_toks = docs.withColumn("__toks", toks)
    conds = []
    for qid, qstr in sorted(queries.items()):
        pq = parse_query_string(
            qstr, lambda s: tokenize_text(s, analyzer), set(filter_fields)
        )
        conds.append(
            F.when(compile_query(pq, F.col("__toks")), F.lit(qid))
        )
    matched = F.array_compact(F.array(*conds))
    return (
        with_toks.withColumn("matched_queries", matched)
        .where(F.size("matched_queries") > 0)
        .drop("__toks")
    )
