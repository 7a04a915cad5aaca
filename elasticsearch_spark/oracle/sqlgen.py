"""ANSI-SQL (DuckDB-runnable) oracle generator for BM25 top-k.

Mirrors query/online.py exactly — same tokenizer (the SQL-expressible
"simple" analyzer), same Lucene idf, same byte315 norm quantization (via a
≤256-row inline range table from functions/smallfloat.py), same global-DFS
statistics, same (rounded score DESC, key ASC) ordering. Used by
__spark_entry__.oracle_sql() so the driver can verify the Spark engine
against an independent SQL engine.
"""

from __future__ import annotations

from typing import Sequence

from elasticsearch_spark.functions.smallfloat import quantized_length_ranges

SIMPLE_TOKEN_SQL = "[a-z0-9]+"


def _ranges_cte(max_dl: int = 1 << 16) -> str:
    rows = ",".join(
        f"({lo},{hi},{eff!r})" for lo, hi, eff in quantized_length_ranges(max_dl)
    )
    return f"ranges(lo, hi, dl_eff) AS (VALUES {rows})"


def bm25_topk_sql(
    terms: Sequence[str],
    table: str = "documents",
    key: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    need: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: bool = True,
    filter_sql: str | None = None,
    score_decimals: int = 4,
) -> str:
    """DuckDB SQL computing the same rows as bm25_topk_online(...)."""
    terms_sql = ",".join("'" + t.replace("'", "''") + "'" for t in terms)
    if quantize:
        ranges = _ranges_cte() + ","
        dle = (
            f"dle AS (SELECT dl.{key}, COALESCE(r.dl_eff, 0.0) AS dl_eff "
            f"FROM dl LEFT JOIN ranges r ON dl.doc_len BETWEEN r.lo AND r.hi),"
        )
    else:
        ranges = ""
        dle = f"dle AS (SELECT {key}, CAST(doc_len AS DOUBLE) AS dl_eff FROM dl),"
    filt = (
        f"AND p.{key} IN (SELECT {key} FROM {table} WHERE {filter_sql})"
        if filter_sql
        else ""
    )
    return f"""
WITH toks AS (
  SELECT {key}, regexp_extract_all(lower({text_col}), '{SIMPLE_TOKEN_SQL}') AS t
  FROM {table}
),
dl AS (SELECT {key}, len(t) AS doc_len FROM toks),
{ranges}
{dle}
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
hits AS (
  SELECT {key}, term, count(*) AS tf
  FROM (SELECT {key}, unnest(t) AS term FROM toks)
  WHERE term IN ({terms_sql})
  GROUP BY {key}, term
),
tstats AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
scored AS (
  SELECT h.{key},
         ln(1.0 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (h.tf * {k1 + 1.0})
           / (h.tf + {k1} * (1.0 - {b} + {b} * e.dl_eff / s.avgdl)) AS tsc
  FROM hits h
  JOIN tstats ts USING (term)
  JOIN dle e USING ({key})
  CROSS JOIN stats s
),
perdoc AS (
  SELECT {key}, sum(tsc) AS raw, count(*) AS nt FROM scored GROUP BY {key}
)
SELECT p.{key} AS {key}, round(p.raw, {score_decimals}) AS score
FROM perdoc p
WHERE p.nt >= {need} {filt}
ORDER BY round(p.raw, {score_decimals}) DESC, p.{key} ASC
LIMIT {k}
""".strip()


def bm25_explain_sql(
    terms: Sequence[str],
    table: str = "documents",
    key: str = "doc_id",
    text_col: str = "text",
    need: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: bool = True,
    decimals: int = 6,
) -> str:
    """DuckDB mirror of the _explain API over the top-1 hit: one row per
    matched query term of the best-scoring doc — (key, term, tf, df, idf,
    tfn, contribution). Selection ties broken like the query path
    (round(score,4) DESC, key ASC)."""
    terms_sql = ",".join("'" + t.replace("'", "''") + "'" for t in terms)
    if quantize:
        ranges = _ranges_cte() + ","
        dle = (
            f"dle AS (SELECT dl.{key}, COALESCE(r.dl_eff, 0.0) AS dl_eff "
            f"FROM dl LEFT JOIN ranges r ON dl.doc_len BETWEEN r.lo AND r.hi),"
        )
    else:
        ranges = ""
        dle = f"dle AS (SELECT {key}, CAST(doc_len AS DOUBLE) AS dl_eff FROM dl),"
    return f"""
WITH toks AS (
  SELECT {key}, regexp_extract_all(lower({text_col}), '{SIMPLE_TOKEN_SQL}') AS t
  FROM {table}
),
dl AS (SELECT {key}, len(t) AS doc_len FROM toks),
{ranges}
{dle}
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
hits AS (
  SELECT {key}, term, count(*) AS tf
  FROM (SELECT {key}, unnest(t) AS term FROM toks)
  WHERE term IN ({terms_sql})
  GROUP BY {key}, term
),
tstats AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
scored AS (
  SELECT h.{key}, h.term, h.tf, ts.df,
         ln(1.0 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5)) AS idf,
         (h.tf * {k1 + 1.0})
           / (h.tf + {k1} * (1.0 - {b} + {b} * e.dl_eff / s.avgdl)) AS tfn
  FROM hits h
  JOIN tstats ts USING (term)
  JOIN dle e USING ({key})
  CROSS JOIN stats s
),
perdoc AS (
  SELECT {key}, sum(idf * tfn) AS raw, count(*) AS nt FROM scored GROUP BY {key}
),
top1 AS (
  SELECT {key} FROM perdoc WHERE nt >= {need}
  ORDER BY round(raw, 4) DESC, {key} ASC LIMIT 1
)
SELECT s.{key} AS {key}, s.term AS term, s.tf AS tf, s.df AS df,
       round(s.idf, {decimals}) AS idf, round(s.tfn, {decimals}) AS tfn,
       round(s.idf * s.tfn, {decimals}) AS contribution
FROM scored s JOIN top1 USING ({key})
ORDER BY s.term ASC
""".strip()


def _field_score_cte(
    alias: str,
    terms_sql: str,
    table: str,
    key: str,
    text_col: str,
    k1: float,
    b: float,
    quantize: bool,
) -> str:
    """CTE chain computing per-doc BM25 (need>=1) for one field; emits a
    final CTE named ``{alias}`` with columns ({key}, score)."""
    a = alias
    if quantize:
        dle = (
            f"{a}_dle AS (SELECT d.{key}, COALESCE(r.dl_eff, 0.0) AS dl_eff "
            f"FROM {a}_dl d LEFT JOIN ranges r ON d.doc_len BETWEEN r.lo AND r.hi),"
        )
    else:
        dle = f"{a}_dle AS (SELECT {key}, CAST(doc_len AS DOUBLE) AS dl_eff FROM {a}_dl),"
    return f"""
{a}_toks AS (
  SELECT {key}, regexp_extract_all(lower({text_col}), '{SIMPLE_TOKEN_SQL}') AS t
  FROM {table}
),
{a}_dl AS (SELECT {key}, len(t) AS doc_len FROM {a}_toks),
{dle}
{a}_stats AS (
  SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
  FROM {a}_dl
),
{a}_hits AS (
  SELECT {key}, term, count(*) AS tf
  FROM (SELECT {key}, unnest(t) AS term FROM {a}_toks)
  WHERE term IN ({terms_sql})
  GROUP BY {key}, term
),
{a}_ts AS (SELECT term, count(*) AS df FROM {a}_hits GROUP BY term),
{a} AS (
  SELECT h.{key}, sum(
    ln(1.0 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5))
      * (h.tf * {k1 + 1.0})
      / (h.tf + {k1} * (1.0 - {b} + {b} * e.dl_eff / s.avgdl))) AS score
  FROM {a}_hits h
  JOIN {a}_ts ts USING (term)
  JOIN {a}_dle e USING ({key})
  CROSS JOIN {a}_stats s
  GROUP BY h.{key}
)""".strip()


def multi_match_sql(
    terms: Sequence[str],
    fields: Sequence[str],
    table: str = "documents",
    key: str = "doc_id",
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: bool = True,
    score_decimals: int = 4,
) -> str:
    """DuckDB SQL mirroring multi_match_online (per-field stats, best/most
    fields combine)."""
    terms_sql = ",".join("'" + t.replace("'", "''") + "'" for t in terms)
    ctes = [
        _field_score_cte(f"f{i}", terms_sql, table, key, fld, k1, b, quantize)
        for i, fld in enumerate(fields)
    ]
    ranges = _ranges_cte() if quantize else ""
    scores = [f"COALESCE(f{i}.score, 0.0)" for i in range(len(fields))]
    if match_type == "most_fields":
        combine = " + ".join(scores)
    else:
        best = f"greatest({', '.join(scores)})" if len(scores) > 1 else scores[0]
        total = " + ".join(scores)
        combine = f"{best} + {tie_breaker} * (({total}) - {best})"
    joins = "f0"
    for i in range(1, len(fields)):
        joins += f" FULL OUTER JOIN f{i} USING ({key})"
    with_items = ", ".join(([ranges] if ranges else []) + ctes)
    return f"""
WITH {with_items}
SELECT {key}, round({combine}, {score_decimals}) AS score
FROM ({joins})
ORDER BY score DESC, {key} ASC
LIMIT {k}
""".strip()


def fuzzy_sql(
    query_term: str,
    table: str = "documents",
    key: str = "doc_id",
    text_col: str = "text",
    fuzziness: int = 2,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: bool = True,
    score_decimals: int = 4,
) -> str:
    """DuckDB SQL mirroring fuzzy_topk_online: dictionary expansion within
    ``fuzziness`` edits, then disjunctive BM25 over the expansion."""
    q = query_term.replace("'", "''").lower()
    if quantize:
        ranges = _ranges_cte() + ","
        dle = (
            f"dle AS (SELECT dl.{key}, COALESCE(r.dl_eff, 0.0) AS dl_eff "
            f"FROM dl LEFT JOIN ranges r ON dl.doc_len BETWEEN r.lo AND r.hi),"
        )
    else:
        ranges = ""
        dle = f"dle AS (SELECT {key}, CAST(doc_len AS DOUBLE) AS dl_eff FROM dl),"
    return f"""
WITH toks AS (
  SELECT {key}, regexp_extract_all(lower({text_col}), '{SIMPLE_TOKEN_SQL}') AS t
  FROM {table}
),
dl AS (SELECT {key}, len(t) AS doc_len FROM toks),
{ranges}
{dle}
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
expanded AS (
  SELECT DISTINCT term FROM (SELECT unnest(t) AS term FROM toks)
  WHERE len(term) BETWEEN {max(len(q) - fuzziness, 0)} AND {len(q) + fuzziness}
    AND levenshtein(term, '{q}') <= {fuzziness}
),
hits AS (
  SELECT {key}, term, count(*) AS tf
  FROM (SELECT {key}, unnest(t) AS term FROM toks)
  WHERE term IN (SELECT term FROM expanded)
  GROUP BY {key}, term
),
tstats AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
perdoc AS (
  SELECT h.{key}, sum(
    ln(1.0 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5))
      * (h.tf * {k1 + 1.0})
      / (h.tf + {k1} * (1.0 - {b} + {b} * e.dl_eff / s.avgdl))) AS raw
  FROM hits h
  JOIN tstats ts USING (term)
  JOIN dle e USING ({key})
  CROSS JOIN stats s
  GROUP BY h.{key}
)
SELECT {key}, round(raw, {score_decimals}) AS score
FROM perdoc
ORDER BY round(raw, {score_decimals}) DESC, {key} ASC
LIMIT {k}
""".strip()


def bm25_phrase_sql(
    terms: Sequence[str],
    table: str = "documents",
    key: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: bool = True,
    score_decimals: int = 4,
    slop: int = 0,
    filter_sql: str | None = None,
) -> str:
    """DuckDB SQL computing the same rows as phrase_topk(..., slop=slop).

    slop=0: freq per doc = number of anchor positions where the exact token
    sequence occurs (ExactPhraseScorer semantics).
    slop>0: the engine's documented bounded-displacement semantics — an
    anchor position p of the first term survives if every later term i has
    an occurrence q with |q - i - p| <= slop (occurrences before the
    phrase offset, q < i, are legal — matches near document start count).
    score = (Σ idf) · tfNorm(freq). ``filter_sql`` is ES filter context:
    restricts membership, never changes scores (df stays corpus-global).
    """
    n = len(terms)
    esc = [t.replace("'", "''") for t in terms]
    if slop == 0:
        cond = " AND ".join(f"t[i+{i}] = '{w}'" for i, w in enumerate(esc))
        freq_expr = (
            f"len([i for i in range(1, greatest(len(t) - {n} + 2, 1)) if {cond}])"
        )
    else:
        # 1-indexed SQL positions: |q - i - p| mirrors the 0-indexed
        # |(q0 - i) - p0| of the engine kernel exactly
        later = " AND ".join(
            f"len([q for q in range(1, len(t) + 1) if t[q] = '{w}'"
            f" AND abs(q - {i} - p) <= {slop}]) > 0"
            for i, w in enumerate(esc[1:], start=1)
        )
        freq_expr = (
            f"len([p for p in range(1, len(t) + 1) if t[p] = '{esc[0]}'"
            + (f" AND {later}" if later else "")
            + "])"
        )
    df_cols = ",".join(
        f"sum(CASE WHEN list_contains(t, '{w}') THEN 1 ELSE 0 END) AS df{i}"
        for i, w in enumerate(esc)
    )
    sum_idf = " + ".join(
        f"ln(1.0 + (s.n_docs - d.df{i} + 0.5) / (d.df{i} + 0.5))" for i in range(n)
    )
    if quantize:
        ranges = _ranges_cte() + ","
        dle = (
            f"dle AS (SELECT dl.{key}, COALESCE(r.dl_eff, 0.0) AS dl_eff "
            f"FROM dl LEFT JOIN ranges r ON dl.doc_len BETWEEN r.lo AND r.hi),"
        )
    else:
        ranges = ""
        dle = f"dle AS (SELECT {key}, CAST(doc_len AS DOUBLE) AS dl_eff FROM dl),"
    filt = (
        f"AND f.{key} IN (SELECT {key} FROM {table} WHERE {filter_sql})"
        if filter_sql
        else ""
    )
    return f"""
WITH toks AS (
  SELECT {key}, regexp_extract_all(lower({text_col}), '{SIMPLE_TOKEN_SQL}') AS t
  FROM {table}
),
dl AS (SELECT {key}, len(t) AS doc_len FROM toks),
{ranges}
{dle}
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
dfs AS (SELECT {df_cols} FROM toks),
freqs AS (
  SELECT {key},
         {freq_expr} AS freq
  FROM toks
)
SELECT f.{key} AS {key},
       round(({sum_idf}) * (f.freq * {k1 + 1.0})
             / (f.freq + {k1} * (1.0 - {b} + {b} * e.dl_eff / s.avgdl)),
             {score_decimals}) AS score
FROM freqs f
JOIN dle e USING ({key})
CROSS JOIN stats s CROSS JOIN dfs d
WHERE f.freq > 0 {filt}
ORDER BY score DESC, f.{key} ASC
LIMIT {k}
""".strip()


def mlt_sql(
    sample_key: int,
    table: str = "documents",
    key: str = "doc_id",
    text_col: str = "text",
    max_query_terms: int = 25,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: bool = True,
    score_decimals: int = 4,
) -> str:
    """DuckDB SQL mirroring more_like_this(like_text = text of ``sample_key``).

    Two stages, both replicated from ops/mlt.py: (1) term selection — top
    ``max_query_terms`` sample terms by tf·idf (idf over corpus-global df),
    tie-broken term ASC; (2) disjunctive BM25 (need=1) over the selected
    terms, each with weight = idf (selected terms are unique in the query).
    """
    if quantize:
        ranges = _ranges_cte() + ","
        dle = (
            f"dle AS (SELECT dl.{key}, COALESCE(r.dl_eff, 0.0) AS dl_eff "
            f"FROM dl LEFT JOIN ranges r ON dl.doc_len BETWEEN r.lo AND r.hi),"
        )
    else:
        ranges = ""
        dle = f"dle AS (SELECT {key}, CAST(doc_len AS DOUBLE) AS dl_eff FROM dl),"
    return f"""
WITH toks AS (
  SELECT {key}, regexp_extract_all(lower({text_col}), '{SIMPLE_TOKEN_SQL}') AS t
  FROM {table}
),
dl AS (SELECT {key}, len(t) AS doc_len FROM toks),
{ranges}
{dle}
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
docterms AS (SELECT {key}, unnest(t) AS term FROM toks),
dfreq AS (SELECT term, count(DISTINCT {key}) AS df FROM docterms GROUP BY term),
sample_tf AS (
  SELECT term, count(*) AS tf FROM docterms WHERE {key} = {sample_key} GROUP BY term
),
sel AS (
  SELECT s.term
  FROM sample_tf s JOIN dfreq d USING (term) CROSS JOIN stats st
  ORDER BY s.tf * ln(1.0 + (st.n_docs - d.df + 0.5) / (d.df + 0.5)) DESC,
           s.term ASC
  LIMIT {max_query_terms}
),
hits AS (
  SELECT {key}, term, count(*) AS tf
  FROM docterms WHERE term IN (SELECT term FROM sel)
  GROUP BY {key}, term
),
perdoc AS (
  SELECT h.{key}, sum(
    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * (h.tf * {k1 + 1.0})
      / (h.tf + {k1} * (1.0 - {b} + {b} * e.dl_eff / s.avgdl))) AS raw
  FROM hits h
  JOIN dfreq d USING (term)
  JOIN dle e USING ({key})
  CROSS JOIN stats s
  GROUP BY h.{key}
)
SELECT {key}, round(raw, {score_decimals}) AS score
FROM perdoc
ORDER BY round(raw, {score_decimals}) DESC, {key} ASC
LIMIT {k}
""".strip()


def phrase_prefix_sql(
    fixed: Sequence[str],
    prefix: str,
    table: str = "documents",
    key: str = "doc_id",
    text_col: str = "text",
    max_expansions: int = 50,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: bool = True,
    score_decimals: int = 4,
) -> str:
    """DuckDB SQL mirroring phrase_prefix_topk (MultiPhrasePrefixQuery).

    Expansion = first ``max_expansions`` distinct corpus terms with the
    prefix, in term order (mirrors the term-dictionary walk); freq counts
    anchors whose final position holds ANY expansion; sum_idf adds every
    expansion's idf (Lucene MultiPhraseQuery idfExplain sums all terms).
    """
    esc = [t.replace("'", "''") for t in fixed]
    p = prefix.replace("'", "''")
    n = len(fixed) + 1
    fixed_cond = " AND ".join(f"t[i+{i}] = '{w}'" for i, w in enumerate(esc))
    last_cond = f"list_contains(el, t[i+{n - 1}])"
    cond = f"{fixed_cond} AND {last_cond}" if fixed_cond else last_cond
    fixed_idf = " + ".join(
        f"ln(1.0 + (s.n_docs - (SELECT count(*) FROM toks WHERE list_contains(t, '{w}')) + 0.5)"
        f" / ((SELECT count(*) FROM toks WHERE list_contains(t, '{w}')) + 0.5))"
        for w in esc
    )
    if quantize:
        ranges = _ranges_cte() + ","
        dle = (
            f"dle AS (SELECT dl.{key}, COALESCE(r.dl_eff, 0.0) AS dl_eff "
            f"FROM dl LEFT JOIN ranges r ON dl.doc_len BETWEEN r.lo AND r.hi),"
        )
    else:
        ranges = ""
        dle = f"dle AS (SELECT {key}, CAST(doc_len AS DOUBLE) AS dl_eff FROM dl),"
    sum_idf = f"(SELECT v FROM expidf)" + (f" + {fixed_idf}" if fixed_idf else "")
    return f"""
WITH toks AS (
  SELECT {key}, regexp_extract_all(lower({text_col}), '{SIMPLE_TOKEN_SQL}') AS t
  FROM {table}
),
dl AS (SELECT {key}, len(t) AS doc_len FROM toks),
{ranges}
{dle}
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
docterms AS (SELECT {key}, unnest(t) AS term FROM toks),
exp AS (
  SELECT DISTINCT term FROM docterms
  WHERE term LIKE '{p}%' ORDER BY term LIMIT {max_expansions}
),
expl AS (SELECT list(term ORDER BY term) AS el FROM exp),
expdf AS (
  SELECT term, count(DISTINCT {key}) AS df FROM docterms
  WHERE term IN (SELECT term FROM exp) GROUP BY term
),
expidf AS (
  SELECT sum(ln(1.0 + (s.n_docs - e.df + 0.5) / (e.df + 0.5))) AS v
  FROM expdf e CROSS JOIN stats s
),
freqs AS (
  SELECT {key},
         len([i for i in range(1, greatest(len(t) - {n} + 2, 1)) if {cond}]) AS freq
  FROM toks CROSS JOIN expl
)
SELECT f.{key} AS {key},
       round(({sum_idf}) * (f.freq * {k1 + 1.0})
             / (f.freq + {k1} * (1.0 - {b} + {b} * e.dl_eff / s.avgdl)),
             {score_decimals}) AS score
FROM freqs f
JOIN dle e USING ({key})
CROSS JOIN stats s
WHERE f.freq > 0
ORDER BY score DESC, f.{key} ASC
LIMIT {k}
""".strip()


def span_sql(
    freq_expr: str,
    idf_terms: Sequence[str],
    table: str = "documents",
    key: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: bool = True,
    score_decimals: int = 4,
) -> str:
    """DuckDB SQL for a span query given its per-doc freq comprehension.

    ``freq_expr`` is a DuckDB expression over the token list ``t`` counting
    matching anchor positions (1-indexed) — built by the span entries to
    mirror query/spans.py kernels. score = (Σ idf(idf_terms)) · tfNorm(freq).
    """
    esc = [t.replace("'", "''") for t in idf_terms]
    df_cols = ",".join(
        f"sum(CASE WHEN list_contains(t, '{w}') THEN 1 ELSE 0 END) AS df{i}"
        for i, w in enumerate(esc)
    )
    sum_idf = " + ".join(
        f"ln(1.0 + (s.n_docs - d.df{i} + 0.5) / (d.df{i} + 0.5))"
        for i in range(len(esc))
    )
    if quantize:
        ranges = _ranges_cte() + ","
        dle = (
            f"dle AS (SELECT dl.{key}, COALESCE(r.dl_eff, 0.0) AS dl_eff "
            f"FROM dl LEFT JOIN ranges r ON dl.doc_len BETWEEN r.lo AND r.hi),"
        )
    else:
        ranges = ""
        dle = f"dle AS (SELECT {key}, CAST(doc_len AS DOUBLE) AS dl_eff FROM dl),"
    return f"""
WITH toks AS (
  SELECT {key}, regexp_extract_all(lower({text_col}), '{SIMPLE_TOKEN_SQL}') AS t
  FROM {table}
),
dl AS (SELECT {key}, len(t) AS doc_len FROM toks),
{ranges}
{dle}
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
dfs AS (SELECT {df_cols} FROM toks),
freqs AS (SELECT {key}, {freq_expr} AS freq FROM toks)
SELECT f.{key} AS {key},
       round(({sum_idf}) * (f.freq * {k1 + 1.0})
             / (f.freq + {k1} * (1.0 - {b} + {b} * e.dl_eff / s.avgdl)),
             {score_decimals}) AS score
FROM freqs f
JOIN dle e USING ({key})
CROSS JOIN stats s CROSS JOIN dfs d
WHERE f.freq > 0
ORDER BY score DESC, f.{key} ASC
LIMIT {k}
""".strip()


def common_terms_sql(
    terms: Sequence[str],
    cutoff_frequency: float,
    table: str = "documents",
    key: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: bool = True,
    score_decimals: int = 4,
) -> str:
    """DuckDB SQL mirroring common_terms_search: df/N split, low group
    required (any-of) and scored, high group score-only; plain disjunction
    when no low-frequency term exists."""
    terms_sql = ",".join("'" + t.replace("'", "''") + "'" for t in terms)
    if quantize:
        ranges = _ranges_cte() + ","
        dle = (
            f"dle AS (SELECT dl.{key}, COALESCE(r.dl_eff, 0.0) AS dl_eff "
            f"FROM dl LEFT JOIN ranges r ON dl.doc_len BETWEEN r.lo AND r.hi),"
        )
    else:
        ranges = ""
        dle = f"dle AS (SELECT {key}, CAST(doc_len AS DOUBLE) AS dl_eff FROM dl),"
    return f"""
WITH toks AS (
  SELECT {key}, regexp_extract_all(lower({text_col}), '{SIMPLE_TOKEN_SQL}') AS t
  FROM {table}
),
dl AS (SELECT {key}, len(t) AS doc_len FROM toks),
{ranges}
{dle}
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
hits AS (
  SELECT {key}, term, count(*) AS tf
  FROM (SELECT {key}, unnest(t) AS term FROM toks)
  WHERE term IN ({terms_sql})
  GROUP BY {key}, term
),
tstats AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
lowt AS (
  SELECT term FROM tstats CROSS JOIN stats s
  WHERE df / CAST(s.n_docs AS DOUBLE) <= {cutoff_frequency}
),
scored AS (
  SELECT h.{key},
         ln(1.0 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5))
           * (h.tf * {k1 + 1.0})
           / (h.tf + {k1} * (1.0 - {b} + {b} * e.dl_eff / s.avgdl)) AS tsc
  FROM hits h
  JOIN tstats ts USING (term)
  JOIN dle e USING ({key})
  CROSS JOIN stats s
),
perdoc AS (SELECT {key}, sum(tsc) AS raw FROM scored GROUP BY {key}),
lowdocs AS (
  SELECT DISTINCT {key} FROM hits WHERE term IN (SELECT term FROM lowt)
)
SELECT p.{key} AS {key}, round(p.raw, {score_decimals}) AS score
FROM perdoc p
WHERE (NOT EXISTS (SELECT 1 FROM lowt))
   OR p.{key} IN (SELECT {key} FROM lowdocs)
ORDER BY round(p.raw, {score_decimals}) DESC, p.{key} ASC
LIMIT {k}
""".strip()


def flt_sql(
    like_terms: Sequence[str],
    table: str = "documents",
    key: str = "doc_id",
    text_col: str = "text",
    fuzziness: int = 1,
    max_query_terms: int = 25,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    quantize: bool = True,
    score_decimals: int = 4,
) -> str:
    """DuckDB SQL mirroring ops.mlt.fuzzy_like_this: per-sample-term fuzzy
    dictionary expansion, top max_query_terms by idf (ties term ASC), then
    disjunctive BM25 over the selection."""
    inputs = ",".join("('" + t.replace("'", "''") + "')" for t in like_terms)
    if quantize:
        ranges = _ranges_cte() + ","
        dle = (
            f"dle AS (SELECT dl.{key}, COALESCE(r.dl_eff, 0.0) AS dl_eff "
            f"FROM dl LEFT JOIN ranges r ON dl.doc_len BETWEEN r.lo AND r.hi),"
        )
    else:
        ranges = ""
        dle = f"dle AS (SELECT {key}, CAST(doc_len AS DOUBLE) AS dl_eff FROM dl),"
    return f"""
WITH toks AS (
  SELECT {key}, regexp_extract_all(lower({text_col}), '{SIMPLE_TOKEN_SQL}') AS t
  FROM {table}
),
dl AS (SELECT {key}, len(t) AS doc_len FROM toks),
{ranges}
{dle}
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
docterms AS (SELECT {key}, unnest(t) AS term FROM toks),
dfreq AS (SELECT term, count(DISTINCT {key}) AS df FROM docterms GROUP BY term),
inputs(input) AS (VALUES {inputs}),
exp AS (
  SELECT DISTINCT d.term, d.df
  FROM dfreq d JOIN inputs i
    ON len(d.term) BETWEEN len(i.input) - {fuzziness} AND len(i.input) + {fuzziness}
   AND levenshtein(d.term, i.input) <= {fuzziness}
),
sel AS (
  SELECT term FROM exp CROSS JOIN stats s
  ORDER BY ln(1.0 + (s.n_docs - df + 0.5) / (df + 0.5)) DESC, term ASC
  LIMIT {max_query_terms}
),
hits AS (
  SELECT {key}, term, count(*) AS tf
  FROM docterms WHERE term IN (SELECT term FROM sel)
  GROUP BY {key}, term
),
perdoc AS (
  SELECT h.{key}, sum(
    ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * (h.tf * {k1 + 1.0})
      / (h.tf + {k1} * (1.0 - {b} + {b} * e.dl_eff / s.avgdl))) AS raw
  FROM hits h
  JOIN dfreq d USING (term)
  JOIN dle e USING ({key})
  CROSS JOIN stats s
  GROUP BY h.{key}
)
SELECT {key}, round(raw, {score_decimals}) AS score
FROM perdoc
ORDER BY round(raw, {score_decimals}) DESC, {key} ASC
LIMIT {k}
""".strip()
