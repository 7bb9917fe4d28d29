"""Text analysis over document tables — Spark built-ins only (JVM-side,
whole-stage codegen); no Python in the hot path.

Operators: token counting, quality scoring (length/punct/stopword
ratios), n-gram language id, and document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = r"\s+"
# BPE-ish word/subword pieces: runs of letters, digits, or single punct
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "a", "that", "for", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con", "para", "es"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/null)."""
    trimmed = F.trim(col)
    return F.when(
        F.coalesce(trimmed, F.lit("")) == "", F.lit(0)
    ).otherwise(F.size(F.split(trimmed, TOKEN_RE))).cast("long")


def bpe_ish_count(col: Column) -> Column:
    """Subword-piece count via a BPE-ish regex (letters / digits / punct)."""
    return F.size(
        F.filter(
            F.split(F.regexp_replace(F.coalesce(col, F.lit("")), f"({BPE_RE})", "$1\u241e"), "\u241e"),
            lambda s: s != "",
        )
    ).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uppercase ratios + a composite
    quality score in [0, 1]."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    n_tokens = token_count(c)
    toks = F.split(F.lower(F.trim(c)), TOKEN_RE)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS["en"])))
    safe = F.greatest(n_chars, F.lit(1))
    safe_t = F.greatest(n_tokens, F.lit(1))
    out = df.withColumns({
        "n_chars_q": n_chars.cast("long"),
        "n_tokens": n_tokens,
        "punct_ratio": (n_punct / safe).cast("double"),
        "upper_ratio": (n_upper / safe).cast("double"),
        "stopword_ratio": (n_stop / safe_t).cast("double"),
        "mean_token_len": (n_chars / safe_t).cast("double"),
    })
    score = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 4, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 5, F.lit(1.0)) * 0.3
    )
    return out.withColumn("quality_score", score.cast("double"))


def language_id(df: DataFrame, text_col: str = "text",
                out_col: str = "lang_pred") -> DataFrame:
    """Stopword-overlap language id: score each language by the share of
    tokens in its tiny stopword list; pick the argmax ('und' = tie/none).

    Pure built-ins: split -> per-language filter+size -> greatest.
    """
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), TOKEN_RE)

    def stop_filter(sw):
        # single-arg lambda factory: a two-arg lambda would make F.filter
        # pass (element, index) and bind the index where sw belongs
        return lambda t: t.isin(sw)

    scores = {
        lang: F.size(F.filter(toks, stop_filter(sw)))
        for lang, sw in STOPWORDS.items()
    }
    best = None
    for lang, s in scores.items():
        cand = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        best = cand if best is None else F.when(cand["score"] > best["score"], cand).otherwise(best)
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def fingerprint(df: DataFrame, text_col: str = "text",
                out_col: str = "fingerprint") -> DataFrame:
    """64-bit document fingerprint: xxhash64 of the
    whitespace-normalized, lowercased text (robust to reflow)."""
    normalized = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " ")
    return df.withColumn(out_col, F.xxhash64(normalized))
