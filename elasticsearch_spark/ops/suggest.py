"""Suggesters (SURVEY.md §2.6).

Reference: search/suggest/term/TermSuggester.java:41-54 — per input token,
DirectSpellChecker proposes dictionary terms within max_edits, ranked by
(score desc, doc_freq desc); search/suggest/phrase/PhraseSuggester.java —
candidate generation per token + language-model rerank (StupidBackoff is
the ES default word-scorer, search/suggest/phrase/StupidBackoffScorer.java).

Spark shape: the term dictionary IS a table (termstats), so suggestion is a
filtered scan: levenshtein() against the input, rank by (distance asc,
df desc, term asc). All input tokens are corrected in ONE job (broadcast
token table joined against one dictionary scan), not a job per token.
Candidate generation prunes the scan with cheap SQL predicates
(first-letter match + length window) before the O(len²) edit distance.
"""

from __future__ import annotations

import math
from itertools import product

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from elasticsearch_spark.analysis.analyzers import tokenize_text
from elasticsearch_spark.index.reader import IndexReader


def term_suggest_df(
    term_dict: DataFrame,
    input_term: str,
    max_edits: int = 2,
    size: int = 5,
    min_df: int = 1,
    prefix_len: int = 1,
) -> DataFrame:
    """Suggestions from a (term, df) dictionary table.

    Returns (suggestion, distance, df) ranked (distance ASC, df DESC,
    suggestion ASC), excluding the input term itself. ``prefix_len`` mirrors
    DirectSpellChecker's default 1-char prefix requirement (cheap pushdown
    predicate before levenshtein)."""
    t = input_term.lower()
    cand = term_dict.where(
        (F.length("term") >= len(t) - max_edits)
        & (F.length("term") <= len(t) + max_edits)
        & (F.col("df") >= min_df)
        & (F.col("term") != t)
    )
    if prefix_len > 0:
        cand = cand.where(
            F.col("term").startswith(t[:prefix_len])
        )
    return (
        cand.withColumn("distance", F.levenshtein(F.col("term"), F.lit(t)))
        .where(F.col("distance") <= max_edits)
        .select(F.col("term").alias("suggestion"), "distance", "df")
        .orderBy(
            F.col("distance").asc(), F.col("df").desc(), F.col("suggestion").asc()
        )
        .limit(size)
    )


def term_suggest(
    reader: IndexReader,
    text: str,
    max_edits: int = 2,
    size: int = 5,
    min_df: int = 1,
    prefix_len: int = 1,
) -> dict[str, list[tuple[str, int, int]]]:
    """Per-token suggestions for a whole input string (the _suggest API
    shape): token -> [(suggestion, distance, df)]; exact dictionary hits
    return an empty suggestion list (nothing to correct).

    ALL unknown tokens are corrected by one Spark job: the (tiny) token
    table is broadcast against a single dictionary scan, per-token top-size
    taken with a window over the already-pruned candidate set — never a
    scan per token."""
    out: dict[str, list] = {}
    tokens = list(dict.fromkeys(tokenize_text(text, reader.cfg.analyzer)))
    stats = reader.query_term_stats(tokens)
    unknown = []
    for tok in tokens:
        if stats.get(tok, (0, 0))[0] > 0:
            out[tok] = []
        else:
            out[tok] = []
            unknown.append(tok)
    if not unknown:
        return out

    tok_df = reader.spark.createDataFrame([(t,) for t in unknown], "input string")
    cand = (
        reader.termstats()
        .crossJoin(F.broadcast(tok_df))
        .where(
            (F.length("term") >= F.length("input") - max_edits)
            & (F.length("term") <= F.length("input") + max_edits)
            & (F.col("df") >= min_df)
            & (F.col("term") != F.col("input"))
        )
    )
    if prefix_len > 0:
        cand = cand.where(
            F.substring("term", 1, prefix_len)
            == F.substring("input", 1, prefix_len)
        )
    cand = cand.withColumn(
        "distance", F.levenshtein(F.col("term"), F.col("input"))
    ).where(F.col("distance") <= max_edits)
    # per-token top-size: window over the pruned candidates only (a few
    # hundred rows per token), not the raw dictionary
    w = Window.partitionBy("input").orderBy(
        F.col("distance").asc(), F.col("df").desc(), F.col("term").asc()
    )
    rows = (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= size)
        .select("input", "term", "distance", "df")
        .collect()
    )
    for r in sorted(rows, key=lambda r: (r["distance"], -r["df"], r["term"])):
        out[r["input"]].append((r["term"], r["distance"], r["df"]))
    return out


def bigram_counts(
    reader: IndexReader, pairs: list[tuple[str, str]]
) -> dict[tuple[str, str], int]:
    """Corpus occurrence counts of adjacent word pairs, from the positional
    postings of only the involved terms (the shingle-field LM analog the
    reference builds at index time — here derived on demand from positions).

    Scale shape: the postings scan is term-pruned to the candidate
    vocabulary, and the pair counting runs PER SEGMENT as a cogrouped
    Arrow kernel (the same sorted-key intersection the phrase scorer
    uses); only the aggregated (term_a, term_b, count) rows — bounded by
    the pair list, never by posting volume — reach the driver. A hot term
    like 'the' contributes a per-segment integer, not its posting list."""
    from elasticsearch_spark.query.executor import _decode_term_pos

    terms = sorted({t for p in pairs for t in p})
    if not terms or not pairs:
        return {}
    SHIFT = 22
    pair_list = sorted(set(pairs))

    def seg_pair_counts(it):
        import pandas as pd

        for seg in it:
            if seg.empty:
                continue
            seg = seg.sort_values(["term", "first_doc"])
            keys: dict[str, np.ndarray] = {}
            for t, g in seg.groupby("term", sort=False):
                docs, tfs, pos = _decode_term_pos(g)
                doc_of_pos = np.repeat(docs, tfs.astype(np.int64))
                keys[t] = (doc_of_pos << SHIFT) + pos.astype(np.int64)
            out_a, out_b, out_c = [], [], []
            for a, b in pair_list:
                ka, kb = keys.get(a), keys.get(b)
                if ka is None or kb is None:
                    continue
                c = int(np.intersect1d(ka + 1, kb, assume_unique=True).size)
                if c:
                    out_a.append(a)
                    out_b.append(b)
                    out_c.append(c)
            if out_a:
                yield pd.DataFrame({"a": out_a, "b": out_b, "cnt": out_c})

    agg = _bigram_counts_df(reader, terms, seg_pair_counts)
    counts: dict[tuple[str, str], int] = {p: 0 for p in pairs}
    for r in agg.collect():
        counts[(r["a"], r["b"])] = int(r["cnt"])
    return counts


def _bigram_counts_df(reader: IndexReader, terms: list[str], kernel) -> DataFrame:
    """Distributed pair-count plan: term-pruned postings scan → per-segment
    Arrow kernel → global sum. Factored out so plan_audit can assert the
    shape (pushed term filter, FlatMapGroupsInPandas, HashAggregate — and
    no driver-side postings collect anywhere)."""
    per_seg = (
        reader.postings()
        .where(F.col("term").isin(terms))
        .select(
            "segment_id", "term", "block_id", "n_docs", "first_doc",
            "docs_packed", "tfs_packed", "pos_packed",
        )
        .groupBy("segment_id")
        .applyInPandas(
            lambda _key, seg: next(kernel([seg]), _EMPTY_PAIRS()),
            schema="a string, b string, cnt long",
        )
    )
    return per_seg.groupBy("a", "b").agg(F.sum("cnt").alias("cnt"))


def _EMPTY_PAIRS():
    import pandas as pd

    return pd.DataFrame({"a": [], "b": [], "cnt": []})


def phrase_suggest_scored(
    reader: IndexReader,
    text: str,
    max_edits: int = 2,
    max_candidates: int = 3,
    backoff: float = 0.4,
    max_combinations: int = 64,
) -> list[tuple[str, float]]:
    """Whole-phrase corrections ranked by a StupidBackoff bigram LM.

    P(w_i | w_{i-1}) = count(w_{i-1} w_i) / ttf(w_{i-1}) when the bigram
    occurs, else ``backoff`` · (ttf(w_i)+0.5)/total (+0.5 smoothing keeps
    unseen unigrams finite); candidate sequences are the cross product of
    per-token candidate sets (known token → itself; unknown → its term
    suggestions, or itself if none), capped at ``max_combinations``.
    Returns [(correction, log-score)] best-first, deterministic ties.
    """
    tokens = tokenize_text(text, reader.cfg.analyzer)
    if not tokens:
        return []
    sugg = term_suggest(reader, text, max_edits=max_edits, size=max_candidates)
    cand_sets: list[list[str]] = []
    for tok in tokens:
        s = sugg.get(tok, [])
        cand_sets.append([x[0] for x in s] or [tok])

    combos = []
    for combo in product(*cand_sets):
        combos.append(combo)
        if len(combos) >= max_combinations:
            break

    vocab = sorted({w for c in combos for w in c})
    stats = reader.query_term_stats(vocab)
    total = max(int(reader.meta.get("total_tokens", 1)), 1)
    needed = sorted({(c[i], c[i + 1]) for c in combos for i in range(len(c) - 1)})
    big = bigram_counts(reader, needed) if needed else {}

    def ttf(w: str) -> float:
        return float(stats.get(w, (0, 0))[1])

    def logp(seq: tuple[str, ...]) -> float:
        lp = math.log((ttf(seq[0]) + 0.5) / total)
        for i in range(1, len(seq)):
            b = big.get((seq[i - 1], seq[i]), 0)
            prev = ttf(seq[i - 1])
            if b > 0 and prev > 0:
                lp += math.log(b / prev)
            else:
                lp += math.log(backoff * (ttf(seq[i]) + 0.5) / total)
        return lp

    scored = [(" ".join(c), logp(c)) for c in combos]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored


def phrase_suggest(
    reader: IndexReader,
    text: str,
    max_edits: int = 2,
    max_candidates: int = 3,
) -> str:
    """Best whole-phrase correction (LM-reranked; PhraseSuggester shape)."""
    scored = phrase_suggest_scored(
        reader, text, max_edits=max_edits, max_candidates=max_candidates
    )
    return scored[0][0] if scored else text


def completion_suggest(
    term_dict: DataFrame,
    prefix: str,
    size: int = 5,
) -> DataFrame:
    """Completion suggester approximation (search/suggest/completion/ —
    the reference walks a weight-ordered FST; the analog here is a
    prefix-pruned scan of the term dictionary ranked by doc frequency).
    Returns (completion, df) ordered (df DESC, completion ASC), ≤ size.
    Scale: prefix pushdown on the term-sorted dictionary → row-group
    pruned scan, no shuffle before the tiny top-k."""
    p = prefix.lower()
    return (
        term_dict.where(F.col("term").startswith(p))
        .select(F.col("term").alias("completion"), "df")
        .orderBy(F.col("df").desc(), F.col("completion").asc())
        .limit(size)
    )


def build_completion_entries(
    docs: DataFrame,
    input_col,
    weight_col,
    output_col=None,
    payload_col=None,
) -> DataFrame:
    """Normalize documents into completion entries.

    Reference: index/mapper/core/CompletionFieldMapper.java:260-370 — each
    doc supplies input(s), an optional surface form ("output", defaults to
    the input), a long weight, and an opaque payload; the field builds a
    weight-ordered FST over the analyzed inputs.

    Spark shape: entries are ROWS of a (input, output, weight, payload)
    table — the "FST" is simply this table sorted/pruned by the lookup.
    Columns may be names or Column expressions. Output defaults to the
    input's original casing; payload defaults to NULL.
    """
    inp = F.col(input_col) if isinstance(input_col, str) else input_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    out = (
        inp
        if output_col is None
        else (F.col(output_col) if isinstance(output_col, str) else output_col)
    )
    pay = (
        F.lit(None).cast("string")
        if payload_col is None
        else (F.col(payload_col) if isinstance(payload_col, str) else payload_col)
    )
    return docs.select(
        F.lower(inp).alias("input"),
        out.alias("output"),
        w.cast("long").alias("weight"),
        pay.alias("payload"),
    )


def completion_suggest_weighted(
    entries: DataFrame,
    prefix: str,
    size: int = 5,
    fuzziness: int = 0,
    prefix_length: int = 1,
    min_length: int = 3,
) -> DataFrame:
    """Weight-ordered completion lookup with optional fuzzy prefix.

    Reference: search/suggest/completion/CompletionSuggester.java (FST
    walk returns surface forms by weight DESC, deduped) and
    CompletionSuggestionFuzzyBuilder.java:40-44 (fuzziness defaults ONE,
    leading `prefix_length` chars exact, prefixes shorter than
    `min_length` matched exactly — XFuzzySuggester defaults).

    Spark shape: predicate-pruned scan of the entries table — exact mode
    pushes a `startswith` straight to the parquet scan; fuzzy mode keeps
    the cheap first-`prefix_length` guard sargable and applies
    levenshtein() on the prefix-truncated input only to the survivors.
    Dedup by surface form keeps the max-weight entry; its payload is
    chosen by lexicographic max over (weight, payload) so weight ties
    break deterministically — one small aggregation, then a tiny top-k.

    Returns (completion, weight, payload) ordered (weight DESC,
    completion ASC), ≤ size rows.
    """
    p = prefix.lower()
    if fuzziness <= 0 or len(p) < min_length:
        cand = entries.where(F.col("input").startswith(p))
    else:
        head, rest = p[:prefix_length], p[prefix_length:]
        cand = entries.where(
            F.col("input").startswith(head)
            & (
                F.levenshtein(
                    F.substring(F.col("input"), prefix_length + 1, len(rest)),
                    F.lit(rest),
                )
                <= fuzziness
            )
        )
    return (
        cand.groupBy(F.col("output").alias("completion"))
        .agg(F.max(F.struct("weight", "payload")).alias("m"))
        .select(
            "completion",
            F.col("m.weight").alias("weight"),
            F.col("m.payload").alias("payload"),
        )
        .orderBy(F.col("weight").desc(), F.col("completion").asc())
        .limit(size)
    )


def write_completion_entries(entries: DataFrame, path: str, n_buckets: int = 8) -> None:
    """Persist completion entries range-partitioned and sorted by input.

    The reference builds an FST per segment at index time
    (Completion090PostingsFormat.java); the Spark analog is a parquet
    table range-partitioned + sorted on the (pre-lowercased) `input`
    column, so a prefix lookup becomes a min/max row-group-pruned scan
    with the StartsWith predicate pushed to the reader — no full pass
    over the dictionary at any scale.
    """
    (
        entries.repartitionByRange(n_buckets, "input")
        .sortWithinPartitions("input")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_completion_entries(spark, path: str) -> DataFrame:
    """Open a persisted completion dictionary (see write_completion_entries)."""
    return spark.read.parquet(path)
