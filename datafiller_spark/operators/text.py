"""Text analysis operators for training-data pipelines (engine extras).

All JVM-side Spark built-ins — no Python in the hot path. Each operator
is deliberately expressible in ANSI SQL so the DuckDB oracle can verify
it value-for-value:

- ``tokenize_counts``: whitespace token count (the ``n_tok`` rule).
- ``quality_score``: length/punctuation/digit/stopword features + a
  composite score — the usual cheap pre-filter before expensive dedup.
- ``lang_id``: stopword-vote heuristic over 4 language profiles.
- ``fingerprint``: md5 of whitespace-normalized lowercased text — the
  canonical exact-dedup key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "que", "un", "une"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"),
    "es": ("el", "la", "los", "de", "y", "es", "que", "un", "una", "en"),
}


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for blank/empty text."""
    return (
        F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(F.size(_words(text)))
    ).cast("int")


def _stopword_hits(text: Column, lang: str) -> Column:
    vocab = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(_words(F.lower(text)), lambda w: F.array_contains(vocab, w)))


def tokenize_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tok", token_count(F.col(text_col)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap quality features + composite score in [0, 1]."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tok = token_count(text)
    punct = n_chars - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    digits = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    stop_hits = _stopword_hits(text, "en")
    mean_word_len = F.when(n_tok > 0, (F.length(F.regexp_replace(F.trim(text), r"\s+", "")).cast("double")) / n_tok).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok.cast("double") / 64.0, F.lit(1.0)) * 0.4
        + F.when(n_chars > 0, 1.0 - F.least(punct.cast("double") * 8.0 / n_chars, F.lit(1.0))).otherwise(F.lit(0.0)) * 0.2
        + F.when(n_chars > 0, 1.0 - F.least(digits.cast("double") * 4.0 / n_chars, F.lit(1.0))).otherwise(F.lit(0.0)) * 0.2
        + F.least(stop_hits.cast("double") / 8.0, F.lit(1.0)) * 0.2
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tok.alias("q_tokens"),
        punct.alias("q_punct"),
        digits.alias("q_digits"),
        stop_hits.alias("q_stopwords"),
        F.round(mean_word_len, 4).alias("q_mean_word_len"),
        F.round(score, 6).alias("q_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language guess: argmax over language profiles,
    ``und`` when no profile scores above zero. Ties break by fixed
    language order (en, fr, de, es)."""
    text = F.col(text_col)
    hits = {lang: _stopword_hits(text, lang) for lang in ("en", "fr", "de", "es")}
    best = F.greatest(*hits.values())
    guess = F.when(best <= 0, F.lit("und"))
    for lang in ("en", "fr", "de", "es"):
        guess = guess.when(hits[lang] == best, F.lit(lang))
    return df.select(
        "*",
        *[hits[lang].alias(f"hits_{lang}") for lang in ("en", "fr", "de", "es")],
        guess.alias("lang_guess"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical content fingerprint: md5 over normalized text."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fp", F.md5(normalized))
