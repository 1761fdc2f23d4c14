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


def bpe_merges(
    docs: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Byte-pair-encoding vocabulary induction (Sennrich et al. 2016,
    word-frequency formulation): learn the first ``k`` merge rules —
    each round merges the globally most frequent adjacent symbol pair
    (ties broken (left, right) ascending, so the rule sequence is
    deterministic).  Returns the learned table
    (merge_rank, left_sym, right_sym, pair_count).

    Scale design: the only corpus-proportional work is ONE word-count
    shuffle (map-side partials, words never re-scanned); the merge loop
    runs on the DISTINCT-WORD table — vocabulary-sized, orders of
    magnitude smaller than a 100 TB corpus — which is localCheckpointed
    once so the k rounds never re-execute the corpus scan.  Each round
    is one vocab-sized pair-explode + sum shuffle plus a ONE-ROW argmax
    collect (bounded metadata, same contract as sim4's centroids).

    Symbol sequences are stored delimited as ``|a||b||c|``: every
    symbol carries its own ``|...|`` wrapper, so the merge rewrite
    ``replace('|l||r|' -> '|lr|')`` shares NO characters between
    adjacent matches and plain left-to-right replace() implements the
    greedy non-overlapping BPE merge exactly — the same call in Spark
    and DuckDB, which is what makes the oracle value-exact.  (A
    space-joined encoding would need lookaround regexes, which RE2
    lacks.)  Words containing the delimiter are excluded up front.
    The wrapper regex is ``(?s)(.)`` — WITH dotall — because Java's
    bare ``.`` skips \\r/\\u0085/\\u2028/\\u2029 while RE2's skips only
    \\n: a carriage return inside a word would wrap differently per
    engine (breaking the value-exact twin) and an unwrapped terminator
    would weld its neighbors into a composite symbol embedding the
    delimiter.  Under dotall every character is its own symbol on both
    engines.  Simplification vs Sennrich: no end-of-word marker —
    merges are intra-word either way because sequences are per word."""
    spark = docs.sparkSession
    words = (
        docs.where(F.col(text_col).isNotNull())
        .select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where((F.length("w") > 0) & (~F.col("w").contains("|")))
    )
    wf = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(
            F.regexp_replace("w", "(?s)(.)", r"|$1|").alias("seq"), "freq"
        )
        .localCheckpoint(eager=True)
    )
    pair_expr = (
        "explode(zip_with("
        "  slice(syms, 1, size(syms) - 1),"
        "  slice(syms, 2, size(syms) - 1),"
        "  (a, b) -> struct(a AS l, b AS r)))"
    )
    out_rows = []
    cur = wf
    for rank in range(1, k + 1):
        counts = (
            cur.select(
                "freq",
                F.expr("split(btrim(seq, '|'), '\\\\|\\\\|')").alias("syms"),
            )
            .select("freq", F.expr(pair_expr).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            counts.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break  # fewer than k mergeable pairs in the corpus
        b = best[0]
        out_rows.append((rank, b["l"], b["r"], b["cnt"]))
        cur = cur.withColumn(
            "seq",
            F.replace(
                F.col("seq"),
                F.lit(f"|{b['l']}||{b['r']}|"),
                F.lit(f"|{b['l']}{b['r']}|"),
            ),
        )
    return spark.createDataFrame(
        out_rows,
        "merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token counts under a learned BPE merge list (the
    "how many tokens is this corpus" question every training-data
    budget starts with): apply the merges to each word and count the
    resulting symbols.  Returns (id_col, n_tokens); NULL text → NULL,
    empty text → 0.

    Formulated as explode → per-word codegen expression → sum, NOT an
    ``aggregate()`` higher-order lambda over the word array: Catalyst
    runs higher-order-function lambdas INTERPRETED (the measured
    round-8 trap — 2.5-50× on hot paths), while the exploded form keeps
    the regexp + replace chain inside whole-stage codegen and the
    map-side partial sum shrinks the shuffle to one (id, count) row per
    document.  The merge chain is built with the Column API (literal
    args via ``F.lit``), never spliced into a SQL string — symbols like
    an apostrophe or a backslash are legitimate learned merges on
    natural-language corpora and must not need quoting; only ``|`` is
    structurally excluded (it is the wrapper delimiter).  Merges are a
    learned artifact of bounded size (k rules), the same contract as
    sim4's centroids."""
    for l, r in merges:
        if "|" in l + r:
            raise ValueError(f"merge symbols must be delimiter-free: {(l, r)}")
    w = F.col("w")
    seq = F.regexp_replace(w, "(?s)(.)", r"|$1|")
    for l, r in merges:
        seq = F.replace(seq, F.lit(f"|{l}||{r}|"), F.lit(f"|{l}{r}|"))
    word_cnt = (
        F.when(
            (F.length(w) == 0) | w.contains("|"), F.lit(0).cast("bigint")
        )
        .otherwise(
            F.size(F.split(F.btrim(seq, F.lit("|")), r"\|\|")).cast("bigint")
        )
        .alias("__wc")
    )
    words = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    counts = (
        words.select(id_col, word_cnt)
        .groupBy(id_col)
        .agg(F.sum("__wc").alias("n_tokens"))
    )
    return docs.select(id_col).join(counts, id_col, "left")
