"""Span queries over the positional index (SURVEY.md §2.3).

Reference: the span family registered in
index/query/IndicesQueriesModule.java:90-95 (span_term, span_first,
span_near, span_not, span_or) parsing to Lucene SpanQuery trees.

Engine semantics (documented, mirrored by PyRefEngine and the DuckDB
oracles) — term-leaf spans, each term a width-1 span at its position:

- span_first(term, end):   positions p with p < end (Lucene end() <= end).
- span_near(terms, slop, in_order=True): an anchor p of terms[0] matches if
  a strictly-increasing chain p < q_1 < ... < q_{n-1} through the remaining
  terms exists with q_{n-1} - p - (n-1) <= slop. The greedy nearest-next
  chain is checked — it minimizes the final end, so a valid chain exists
  iff the greedy one is valid.
- span_near unordered (n == 2): positions p of a with an occurrence q of b,
  q != p, |q - p| - 1 <= slop (Lucene's (max.end - min.start) - length).
- span_not(include, exclude, pre, post): positions p of include with no
  exclude occurrence in [p - pre, p + post].

freq(doc) = number of matching anchor positions (each counts 1, like the
engine's sloppy-phrase freq); score = (Σ idf of the positive terms) ·
BM25 tfNorm(freq). span_not scores from the include term only (Lucene
SpanNotQuery).

Execution shape: same scatter/gather as match_phrase — per-segment numpy
kernels over term-pruned postings, ≤ k rows per segment to the gather.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame

from elasticsearch_spark.analysis.analyzers import tokenize_text
from elasticsearch_spark.index.reader import IndexReader
from elasticsearch_spark.query.executor import (
    _PHRASE_COLUMNS,
    _allowed_mask,
    _anchors_to_topk,
    _decode_term_pos,
    _empty_result,
    _execute,
    lucene_idf,
)
from elasticsearch_spark.functions.smallfloat import effective_doc_length

SHIFT = 22


def _span_scorer(kernel, terms_needed: list[str], sum_idf: float, k: int,
                 k1: float, b: float, avgdl: float, quantize: bool):
    """Wrap a per-segment anchor ``kernel(keys_by_term) -> anchor keys``."""

    def score_fn(post: pd.DataFrame, aux: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "local_doc_id": pd.Series([], dtype="int32"),
                "score": pd.Series([], dtype="float64"),
            }
        )
        if post.empty or aux.empty:
            return empty
        n_docs = int(aux["n_docs"].iloc[0])
        doc_lens = np.frombuffer(aux["doc_len_packed"].iloc[0], dtype=np.uint32)
        dl_eff = effective_doc_length(doc_lens, quantize=quantize)
        allowed = _allowed_mask(aux, n_docs)

        post = post.sort_values(["term", "first_doc"])
        by_term = {t: g for t, g in post.groupby("term", sort=False)}

        keys: dict[str, np.ndarray] = {}
        for t in terms_needed:
            g = by_term.get(t)
            if g is None:
                keys[t] = np.array([], dtype=np.int64)
            else:
                docs, tfs, pos = _decode_term_pos(g)
                doc_of_pos = np.repeat(docs, tfs.astype(np.int64))
                keys[t] = (doc_of_pos << SHIFT) + pos.astype(np.int64)
        anchors = kernel(keys)
        if anchors.size == 0:
            return empty
        return _anchors_to_topk(
            anchors, allowed, dl_eff, sum_idf, k, k1, b, avgdl, SHIFT, empty
        )

    return score_fn


def _run(reader: IndexReader, kernel, terms: list[str], idf_terms: list[str],
         k: int, filter_cond: Column | None, extra_cols: Iterable[str],
         mode: str, local_postings_limit: int) -> DataFrame:
    cfg = reader.cfg
    if not cfg.index_positions:
        raise ValueError("index was built with index_positions=False")
    stats = reader.query_term_stats(terms)
    n = reader.n_docs
    sum_idf = float(
        sum(lucene_idf(n, stats.get(t, (0, 0))[0]) for t in idf_terms)
    )
    score_fn = _span_scorer(
        kernel, terms, sum_idf, k, cfg.bm25.k1, cfg.bm25.b, reader.avgdl,
        cfg.bm25.quantize_norms,
    )
    est = sum(stats.get(t, (0, 0))[1] for t in dict.fromkeys(terms))
    return _execute(
        reader, score_fn, list(dict.fromkeys(terms)), k, filter_cond,
        list(extra_cols), mode, est, local_postings_limit, _PHRASE_COLUMNS,
    )


def _analyze_one(reader: IndexReader, word: str) -> str:
    toks = tokenize_text(word, reader.cfg.analyzer)
    return toks[0] if toks else ""


def span_first_topk(
    reader: IndexReader,
    term: str,
    end: int,
    k: int = 10,
    filter_cond: Column | None = None,
    extra_cols: Iterable[str] = (),
    mode: str = "auto",
    local_postings_limit: int = 2_000_000,
) -> DataFrame:
    """SpanFirstQuery: term occurrences within the first ``end`` positions."""
    t = _analyze_one(reader, term)
    if not t:
        return _empty_result(reader, extra_cols)

    def kernel(keys: dict[str, np.ndarray]) -> np.ndarray:
        ks = keys[t]
        return ks[(ks & ((1 << SHIFT) - 1)) < end]

    return _run(reader, kernel, [t], [t], k, filter_cond, extra_cols, mode,
                local_postings_limit)


def span_near_topk(
    reader: IndexReader,
    terms: list[str],
    slop: int = 0,
    in_order: bool = True,
    k: int = 10,
    filter_cond: Column | None = None,
    extra_cols: Iterable[str] = (),
    mode: str = "auto",
    local_postings_limit: int = 2_000_000,
) -> DataFrame:
    """SpanNearQuery over term clauses (greedy ordered chain / unordered
    pair). Unordered supports exactly 2 clauses."""
    toks = [_analyze_one(reader, w) for w in terms]
    if not all(toks):
        return _empty_result(reader, extra_cols)
    if not in_order and len(toks) != 2:
        raise ValueError("unordered span_near supports exactly 2 clauses")
    n = len(toks)

    def kernel(keys: dict[str, np.ndarray]) -> np.ndarray:
        anchors = keys[toks[0]]
        if anchors.size == 0:
            return anchors
        if in_order:
            cur = anchors
            ok = np.ones(cur.size, dtype=bool)
            for t in toks[1:]:
                ks = keys[t]
                if ks.size == 0:
                    return np.array([], dtype=np.int64)
                idx = np.searchsorted(ks, cur, side="right")
                hit = idx < ks.size
                nxt = ks[np.clip(idx, 0, ks.size - 1)]
                same_doc = (nxt >> SHIFT) == (anchors >> SHIFT)
                ok &= hit & same_doc
                cur = np.where(ok, nxt, cur)
            ok &= (cur - anchors - (n - 1)) <= slop
            return anchors[ok]
        # unordered pair: nearest |q - p| - 1 <= slop, q != p
        a, bk = anchors, keys[toks[1]]
        if bk.size == 0:
            return np.array([], dtype=np.int64)
        idx = np.searchsorted(bk, a)
        left = np.abs(bk[np.clip(idx - 1, 0, bk.size - 1)] - a)
        right = np.abs(bk[np.clip(idx, 0, bk.size - 1)] - a)
        left[left == 0] = 1 << 60  # same position is not a distinct span
        right[right == 0] = 1 << 60
        dist = np.minimum(left, right)
        return a[dist - 1 <= slop]

    return _run(reader, kernel, toks, toks, k, filter_cond, extra_cols, mode,
                local_postings_limit)


def span_not_topk(
    reader: IndexReader,
    include: str,
    exclude: str,
    pre: int = 0,
    post: int = 0,
    k: int = 10,
    filter_cond: Column | None = None,
    extra_cols: Iterable[str] = (),
    mode: str = "auto",
    local_postings_limit: int = 2_000_000,
) -> DataFrame:
    """SpanNotQuery: include spans with no exclude span in [p-pre, p+post]."""
    inc = _analyze_one(reader, include)
    exc = _analyze_one(reader, exclude)
    if not inc:
        return _empty_result(reader, extra_cols)

    def kernel(keys: dict[str, np.ndarray]) -> np.ndarray:
        a = keys[inc]
        ex = keys.get(exc, np.array([], dtype=np.int64))
        if a.size == 0 or ex.size == 0:
            return a
        lo = np.searchsorted(ex, a - pre, side="left")
        hi = np.searchsorted(ex, a + post, side="right")
        # [p-pre, p+post] stays inside the doc's key range (doc gaps >> window)
        return a[hi == lo]

    terms = [inc, exc] if exc else [inc]
    return _run(reader, kernel, terms, [inc], k, filter_cond, extra_cols,
                mode, local_postings_limit)
