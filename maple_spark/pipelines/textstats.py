"""Text analysis operators over the ``documents`` table.

All computed with built-in Catalyst expressions (split / regexp / length /
aggregate) — zero Python in the row path, so the whole stage codegens and a
100 TB corpus is a single map-only pass (no shuffle at all unless the caller
aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maple_spark.pipelines.util import spread

#: BPE-ish tokenizer: words, numbers, or single non-space symbols.  Kept to
#: a regex dialect (char classes, alternation, +) that Java and RE2/PCRE
#: interpret identically so the DuckDB oracle matches.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

#: Tiny English stopword list for the language-ID heuristic.
EN_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring feature columns (length / punctuation / stopword
    ratios + token counts) — the usual heuristic filters applied before
    LLM training.

    Counting is done with ``regexp_count``, never by materializing an
    array to take its size: ``size(regexp_extract_all(...))`` builds
    every token string just to throw it away, and a ``filter`` lambda
    runs INTERPRETED (higher-order functions sit outside whole-stage
    codegen — the same measured trap as the dedup verifier).  The
    stopword pattern is exactly equivalent to filtering the
    split-on-space tokens: a token equals a stopword iff the word
    appears bounded by start-or-space and space-or-end; the trailing
    boundary is a LOOKAHEAD so two stopwords sharing one separator
    space both count, and ``\\z`` (not ``$``) so a trailing newline
    doesn't fake a word boundary."""
    df = spread(df)
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(t, " ")
    stop_hits = F.regexp_count(
        F.lower(t),
        F.lit("(?:^| )(?:" + "|".join(EN_STOPWORDS) + ")(?= |\\z)"),
    )
    punct = F.length(F.regexp_replace(t, "[A-Za-z0-9\\s]", ""))
    return (
        df.withColumn("n_chars_calc", n_chars.cast("bigint"))
        .withColumn("n_words", F.size(words).cast("bigint"))
        .withColumn(
            "n_tokens",
            F.regexp_count(t, F.lit(TOKEN_PATTERN)).cast("bigint"),
        )
        .withColumn(
            "punct_ratio",
            F.round(punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                stop_hits.cast("double")
                / F.greatest(F.size(words), F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "avg_word_len",
            F.round(
                (n_chars - F.size(words) + 1).cast("double")
                / F.greatest(F.size(words), F.lit(1)),
                6,
            ),
        )
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score: penalize very short docs, high
    punctuation density, and missing stopwords (gibberish signal)."""
    out = with_text_stats(df, text_col)
    length_score = F.least(F.col("n_words") / F.lit(20.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
    return out.withColumn(
        "quality",
        F.round((length_score + punct_score + stop_score) / 3.0, 6),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword language heuristic: English stopword density ≥ 5%
    → 'en', else 'other'.  (A production system would score per-language
    stopword tables the same way — one pass, one case expression each.)"""
    out = with_text_stats(df, text_col)
    return out.withColumn(
        "predicted_lang",
        F.when(F.col("stopword_ratio") >= 0.05, F.lit("en")).otherwise(
            F.lit("other")
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints:
    - ``fp_md5``: exact-content fingerprint (cross-engine stable).
    - ``fp_rolling``: 64-bit content fingerprint = min xxhash64 over 8-char
      shingles (a 1-permutation MinHash — robust to small edits; the
      winnowing/rolling-hash family).  Spark-specific hash → verified
      rows-only, no SQL oracle.
    """
    from maple_spark.pipelines.dedup import shingle_expr

    t = F.col(text_col)
    shingles = shingle_expr(text_col, 8)
    return df.withColumn("fp_md5", F.md5(t)).withColumn(
        "fp_rolling",
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s))),
    )
