"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in Spark SQL expressions (JVM, codegen) — no Python
UDFs. Designed for the `documents` table schema
(doc_id, text, lang, source, n_chars) but parameterized.

Each operator is a single projection; ``text_profile`` composes all three in
ONE select so the whole profile is a single parquet scan with zero joins
(the separate-operator-then-join formulation costs two shuffles and three
scans for the same output).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic, SQL-expressible punctuation class (identical semantics in
# Spark's Java regex and DuckDB's RE2 for this explicit set)
PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"

# tiny per-language stopword marker sets; counts are exact substring
# occurrences of " word " in the padded lowercased text, so the same value is
# computable in any SQL engine via length/replace arithmetic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "nicht", "ist"],
    "fr": ["le", "et", "les", "des", "est"],
    "es": ["el", "los", "que", "es", "una"],
}


def _occurrences(padded: Column, word: str) -> Column:
    """Count of ``" word "`` occurrences via length arithmetic (no regex)."""
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def _token_stat_cols(text: Column) -> list[Column]:
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    n_spaces = n_chars - F.length(F.replace(text, F.lit(" "), F.lit("")))
    return [
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(
            F.when(n_tokens > 0, (n_chars - n_spaces) / n_tokens).otherwise(F.lit(0.0)), 6
        ).alias("avg_token_len"),
        F.round(
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)), 6
        ).alias("punct_ratio"),
        F.round(
            F.when(n_chars > 0, n_spaces / n_chars).otherwise(F.lit(0.0)), 6
        ).alias("space_ratio"),
    ]


def _language_cols(text: Column) -> list[Column]:
    """Per-language stopword scores + argmax guess, all from one expression
    tree (Catalyst CSEs the shared subexpressions; no second projection
    pass needed for the argmax)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores: dict[str, Column] = {}
    for lang, words in LANG_MARKERS.items():
        score = None
        for w in words:
            occ = _occurrences(padded, w)
            score = occ if score is None else (score + occ)
        scores[lang] = score
    langs = list(LANG_MARKERS)
    guess = F.lit(langs[0])
    best = scores[langs[0]]
    for lang in langs[1:]:
        cand = scores[lang]
        guess = F.when(cand > best, F.lit(lang)).otherwise(guess)
        best = F.when(cand > best, cand).otherwise(best)
    return [
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        F.when(best > 0, guess).otherwise(F.lit("unknown")).alias("lang_guess"),
    ]


def _fingerprint_col(text: Column) -> Column:
    norm = F.regexp_replace(F.lower(text), r"[^a-z0-9 ]", "")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.md5(norm).alias("fingerprint")


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality-scoring statistics per document: char/token counts, average
    token length, punctuation and whitespace ratios."""
    return df.select(F.col(id_col), *_token_stat_cols(F.col(text_col)))


def language_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker counts per language + argmax guess (n-gram-heuristic
    language ID). Fully expression-based; ties broken by language order."""
    return df.select(F.col(id_col), *_language_cols(F.col(text_col)))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 of the lowercased alphanumeric-normalized
    text (same value computable in any engine with md5 + regexp_replace)."""
    return df.select(F.col(id_col), _fingerprint_col(F.col(text_col)))


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token stats + language ID + fingerprint in ONE projection: a single
    scan of the corpus, no joins — the plan to run at 100 TB (the
    per-operator DataFrames join-composed would scan three times and shuffle
    twice for identical output)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        *_token_stat_cols(text),
        *_language_cols(text),
        _fingerprint_col(text),
    )
