"""Text analysis for training-data curation: quality scoring, token
counting, language heuristics, fingerprinting.

All pure `pyspark.sql.functions` expressions — whole-stage codegen,
no Python in the row path, so throughput is scan-bound at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language ID. Real pipelines would load fastText/CLD3 via a Pandas UDF;
# the heuristic keeps the hot path JVM-side and is deterministic.
STOPWORD_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "fr": ["le", "la", "de", "et", "les"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "von"],
}


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_chars, n_words, avg_word_len, stopword_ratio, quality_score.

    quality_score = ln(1 + n_words) * (1 - stopword_ratio): rewards
    length, penalizes stopword-stuffed boilerplate. A deliberately
    simple, deterministic stand-in for model-based quality classifiers.
    """
    t = F.col(text_col)
    words = F.split(F.trim(t), " ")
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin("the", "a")))
    return (
        df.withColumn("n_chars_obs", F.length(t))
        .withColumn("n_words", n_words)
        .withColumn(
            "avg_word_len",
            (F.length(t) - (n_words - F.lit(1))) / n_words,
        )
        .withColumn("stopword_ratio", stop_hits / n_words)
        .withColumn(
            "quality_score",
            F.expr("ln(1 + size(split(trim({t}), ' ')))".format(t=text_col))
            * (F.lit(1.0) - stop_hits / n_words),
        )
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count
    (runs of letters / digits / single other chars)."""
    t = F.col(text_col)
    return df.withColumn(
        "ws_tokens", F.size(F.split(F.trim(t), r"\s+"))
    ).withColumn("word_tokens", F.regexp_count(t, F.lit("[a-z]+")))


def with_language_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language scoring: for each profiled language,
    count stopword hits; guess = argmax (ties -> lexicographic)."""
    words = F.split(F.trim(F.lower(F.col(text_col))), " ")
    scored = df
    for lang, stops in STOPWORD_PROFILES.items():
        scored = scored.withColumn(
            f"_hits_{lang}", F.size(F.filter(words, lambda w: w.isin(*stops)))
        )
    langs = list(STOPWORD_PROFILES)
    best = F.greatest(*[F.col(f"_hits_{lang}") for lang in langs])
    guess = F.lit("und")
    for lang in reversed(langs):
        guess = F.when(F.col(f"_hits_{lang}") == best, F.lit(lang)).otherwise(guess)
    scored = scored.withColumn(
        "lang_guess", F.when(best > 0, guess).otherwise(F.lit("und"))
    )
    return scored.drop(*[f"_hits_{lang}" for lang in langs])


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: lowercase, strip non-alnum,
    collapse whitespace, md5. Robust to formatting-only edits."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""), " +", " "
    )
    return df.withColumn("fingerprint", F.md5(F.trim(norm)))
