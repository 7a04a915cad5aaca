"""Text-analysis operators for corpus curation.

- token_count:  whitespace tokens + a BPE-ish subword-regex count.
- quality:      length / punctuation-ratio / stopword-ratio / mean word len
                heuristics (C4/Gopher-style filters), pure column exprs.
- language id:  character-class n-gram heuristic scoring against tiny
                per-language profiles — vectorized, JVM-side.
- fingerprint:  64-bit rolling/content hash of the normalized text.

Everything is built-in Spark SQL expressions (codegen; no Python), so these
run at full scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a small multilingual stopword sample (language profiles, not filtering)
_STOP_EN = ("the", "of", "and", "to", "in", "a", "is", "that", "it", "for")

# BPE-ish token regex: word pieces, numbers, contractions, single punct —
# the GPT-2 pre-tokenizer shape (public pattern), simplified to RE2-safe form
BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+"


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish piece count per document."""
    return df.withColumn(
        "ws_tokens",
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")),
    ).withColumn(
        "bpe_ish_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), F.lit(0)))
        - F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\s+"), F.lit(0))),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite [0,1] score.

    Features: n_chars, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    digit_ratio, upper_ratio. Composite = product of soft gates (Gopher-rule
    shape: 3 ≤ mean token len ≤ 12, punct ≤ 30%, ≥ 1 stopword hit...).
    """
    t = F.col(text_col)
    toks = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    mean_tok = F.when(
        n_tokens > 0,
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / n_tokens,
    ).otherwise(0.0)
    punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), F.lit(0)))
    digits = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), F.lit(0)))
    upper = F.size(F.regexp_extract_all(t, F.lit(r"[A-Z]"), F.lit(0)))
    stop_arr = F.array(*[F.lit(s) for s in _STOP_EN])
    stop_hits = F.size(F.array_intersect(toks, stop_arr))
    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("mean_token_len", mean_tok)
        .withColumn("punct_ratio", punct / F.greatest(n_chars, F.lit(1)).cast("double"))
        .withColumn("digit_ratio", digits / F.greatest(n_chars, F.lit(1)).cast("double"))
        .withColumn("upper_ratio", upper / F.greatest(n_chars, F.lit(1)).cast("double"))
        .withColumn("stopword_hits", stop_hits)
    )
    gates = (
        F.when((F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 12), 1.0).otherwise(0.5)
        * F.when(F.col("punct_ratio") <= 0.3, 1.0).otherwise(0.5)
        * F.when(F.col("digit_ratio") <= 0.3, 1.0).otherwise(0.7)
        * F.when(F.col("n_tokens") >= 5, 1.0).otherwise(0.3)
    )
    return out.withColumn("quality", gates)


# tiny per-language character profiles (heuristic language-ID)
_LANG_PROFILES: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|that)\b",
    "es": r"\b(el|la|de|que|los|una?)\b|[ñ¿¡]",
    "fr": r"\b(le|la|les|des|une?|est|et)\b|[àâçéèêëîôûù]",
    "de": r"\b(der|die|das|und|ist|nicht)\b|[äöüß]",
    "zh": r"[一-鿿]",
    "ja": r"[぀-ゟ゠-ヿ]",
    "ko": r"[가-힯]",
    "ru": r"[Ѐ-ӿ]",
}


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """n-gram/character-class heuristic language ID (deterministic).

    Scores each profile by matches-per-char; argmax wins, 'und' when all
    zero. This is the classic n-gram-profile approach (Cavnar & Trenkle
    1994) shrunk to class regexes — a stub-quality classifier with real
    Spark plumbing (swap profiles for real ones at will)."""
    t = F.lower(F.col(text_col))
    scores = []
    for lang, rx in _LANG_PROFILES.items():
        cnt = F.size(F.regexp_extract_all(t, F.lit(rx), F.lit(0)))
        scores.append(
            F.struct(
                (cnt / F.greatest(F.length(t), F.lit(1)).cast("double")).alias("s"),
                F.lit(lang).alias("l"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col, F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """64-bit document fingerprint over normalized text (case-folded,
    whitespace-collapsed) — xxhash64; stable across runs."""
    # collapse all whitespace first, then trim — trim() alone only strips
    # the space character, not tabs/newlines
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.xxhash64(normalized))
