"""Corpus-curation operators a training-data pipeline needs beyond dedup:
benchmark decontamination, repetition detection, and PII scrubbing.

All three are map-only dataflows built from Catalyst expressions — the
one exception is repetition's top-word count, an Arrow-batched
pandas_udf kernel (see the inline measurement note: every Catalyst
formulation of per-row word counting is interpreted-lambda quadratic
or worse).  Each has a DuckDB SQL oracle twin in ``__spark_entry__``:

- ``decontaminate``: flag documents sharing any word n-gram with a
  benchmark/eval set — the standard n-gram-overlap decontamination used
  before LLM training (the GPT-3 appendix describes 13-gram overlap; n is
  a parameter).  Scale shape: explode docs to (doc, gram-hash) once,
  build the benchmark gram set once (it is tiny relative to the corpus —
  broadcast), and the flagging join is a broadcast semi-join: the corpus
  shuffles zero times.
- ``repetition_stats``: within-document repetition signals (distinct
  word / bigram ratios, top-token share) — the boilerplate/spam signal
  used by quality filters.  Map-only; no shuffle at all.
- ``pii_scrub``: count + mask email/phone literals with portable
  character-class regexes.  Map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from maple_spark.pipelines.util import spread as _spread

#: portable regex dialect (char classes only) — Java and RE2/PCRE agree,
#: so the DuckDB oracle produces identical matches
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PHONE_RE = "[0-9][0-9][0-9][-][0-9][0-9][0-9][-][0-9][0-9][0-9][0-9]"


@F.pandas_udf(IntegerType())
def _top_word_count(texts):
    """Count of the most frequent space-token per document — Arrow
    batches in, one C-speed ``str.split`` + ``Counter`` per row.  Token
    semantics match ``F.split(text, " ")`` exactly (Python's explicit-
    separator split keeps empty tokens, as Java's ``split(re, -1)``
    does), so the DuckDB oracle stays value-exact.  NULL text → NULL,
    like the Catalyst expression it replaced."""
    from collections import Counter

    def top(t):
        # pandas may surface missing strings as None or float NaN
        # depending on Arrow conversion dtype; both must map to NULL
        if t is None or t != t:
            return None
        return Counter(t.split(" ")).most_common(1)[0][1]

    return texts.map(top).astype("Int32")


def _word_ngrams(text_col: str, n: int, filter_empty: bool = False):
    """Array of space-joined word n-grams (empty when the doc has < n
    words), as a Catalyst expression.  NOTE: the transform/slice/
    array_join lambdas run INTERPRETED (Catalyst higher-order functions
    sit outside whole-stage codegen), which round 8 measured as ~90% of
    t11's 100× wall — bulk/exploded callers should use
    :func:`word_ngrams_best`, which swaps in the Arrow kernel.  This
    expression tier remains the numpy-free fallback and the oracle-side
    semantic definition.  ``filter_empty`` drops zero-length tokens
    (from repeated spaces) before windowing — ONE shared tokenization
    for t11's decontamination (raw tokens, GPT-3 style) and t16's
    vocabulary counts (clean tokens), so the two can never drift."""
    words = F.split(F.col(text_col), " ")
    if filter_empty:
        words = F.filter(words, lambda x: x != "")
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _word_ngrams_arrow_udf(n: int, filter_empty: bool):
    """Arrow-batched twin of :func:`_word_ngrams` — one C-speed
    ``str.split`` + window-join per row instead of per-gram interpreted
    ``slice``/``array_join`` lambdas (measured: the expression tier's
    gram explode was 43-45 s of t11's 47-50 s wall at 100×).

    Token semantics match ``F.split(text, " ")`` exactly: Python's
    explicit-separator split keeps empty tokens like Java's
    ``split(re, -1)``.  NULL text yields the empty array (the
    expression's ``when`` falls through to ``otherwise``), sub-n docs
    the empty array — equality-tested element-for-element."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def grams(texts):
        def one(t):
            if t is None or t != t:  # None or NaN → expr's otherwise([])
                return []
            words = t.split(" ")
            if filter_empty:
                words = [w for w in words if w]
            m = len(words) - n + 1
            if m <= 0:
                return []
            return [" ".join(words[i : i + n]) for i in range(m)]

        return pd.Series([one(t) for t in texts])

    return grams


def word_ngrams_best(
    text_col: str, n: int, filter_empty: bool = False, df: DataFrame | None = None
):
    """The word-n-gram column, fastest tier by COST, not by dogma: the
    Arrow kernel wins 2.5-3× on corpus-scale inputs (interpreted-lambda
    gram build was ~90% of t11's 100× wall) but loses ~15% at toy scale
    to its fixed Python-stage cost — so when the caller passes its
    source ``df`` and parquet metadata says the input is small, the
    Catalyst expression keeps the job UDF-free (the same
    size-from-metadata routing as dedup's carry_sets / join-strategy
    routers; ≤ ``dedup.CARRY_SETS_MAX_BYTES``).  Both tiers are
    value-identical (equality-tested).  Callers that EXPLODE grams over
    a corpus should use this; row-local signal consumers on one scan
    (t12) keep the expression."""
    from maple_spark.pipelines.dedup import CARRY_SETS_MAX_BYTES, _arrow_available

    if not _arrow_available():
        return _word_ngrams(text_col, n, filter_empty)
    if df is not None:
        from maple_spark.pipelines.util import parquet_files_stats

        stats = parquet_files_stats(df)
        if stats is not None and stats[0] <= CARRY_SETS_MAX_BYTES:
            return _word_ngrams(text_col, n, filter_empty)
    return _word_ngrams_arrow_udf(n, filter_empty)(F.col(text_col))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-document contamination report vs the benchmark set:
    (id, n_contaminated_grams, contaminated).

    A document is contaminated when any of its word n-grams appears in
    any benchmark document.  Distinct grams per doc (a gram repeated
    inside one doc counts once — the count answers "how many benchmark
    grams leak into this doc").

    100 TB design: the corpus explodes to (id, gram) and aggregates
    per-doc after a broadcast semi-join against the benchmark gram set —
    benchmark/eval suites are MBs against a corpus of TBs, so the
    expensive side never shuffles; flagging is map-side.  For a huge
    benchmark, swap the broadcast for a shuffled semi-join on gram hash —
    same dataflow.
    """
    doc_grams = _spread(docs).select(
        F.col(id_col),
        F.explode(word_ngrams_best(text_col, n, df=docs)).alias("gram"),
    )
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams_best(text_col, n, df=benchmark)).alias("gram")
        ).distinct()
    )
    # Order matters at scale: the broadcast semi-join FILTERS FIRST (map
    # side, no shuffle of the exploded corpus), so the distinct + count
    # shuffle only the matching (doc, gram) pairs — bounded by actual
    # contamination, not corpus size.  A distinct before the join would
    # shuffle every gram of every document.
    hits = (
        doc_grams.join(F.broadcast(bench_grams), on="gram", how="left_semi")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        docs.select(id_col)
        .join(hits, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_contaminated_grams", F.lit(0)).alias(
                "n_contaminated_grams"
            ),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def _rep_counts_arrow_udf():
    """All repetition-signal COUNTS in one Arrow kernel: words, distinct
    words, distinct bigrams, top-word count — one ``str.split`` per row
    instead of the expression tier's interpreted bigram transform plus a
    SECOND text transfer into :func:`_top_word_count`.  Returns exact
    integers only; the ratios and Spark-semantics ``round`` stay in
    Catalyst, so the signal values (and the DuckDB oracle) are
    bit-identical to the expression tier.  NULL text → NULL struct →
    NULL signals, like the expression tier."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<nw:int,ndw:int,ndb:int,top:int>")
    def rep_counts(texts):
        from collections import Counter

        def one(t):
            if t is None or t != t:
                # ndb is 0, NOT NULL: the expression tier's bigram array
                # falls through when() to otherwise([]) on NULL text, so
                # its distinct_bigram_ratio is 0/1 = 0.0 while the other
                # two signals stay NULL — match that asymmetry exactly
                return (None, None, 0, None)
            words = t.split(" ")
            nw = len(words)
            # set-of-joined-pairs == set-of-tuples: words cannot contain
            # the separator, so no join collisions
            ndb = len(set(zip(words, words[1:]))) if nw >= 2 else 0
            return (
                nw,
                len(set(words)),
                ndb,
                Counter(words).most_common(1)[0][1],
            )

        return pd.DataFrame(
            [one(t) for t in texts], columns=["nw", "ndw", "ndb", "top"]
        )

    return rep_counts


def with_repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Column-appending form of :func:`repetition_stats`: all input
    columns plus the three signals.  Lets a multi-stage curation pipeline
    (cp2) filter on the signals in the SAME scan instead of computing a
    stats-only projection and self-joining it back — the join-back
    pattern re-executes the upstream lineage once per consumer.

    Tier routed by source metadata like :func:`word_ngrams_best`: big
    or unstatable inputs compute the counts in ONE Arrow kernel
    (:func:`_rep_counts_arrow_udf` — the expression tier's bigram
    transform is an interpreted higher-order function, and the top-word
    kernel transferred the text a second time); small parquet inputs
    keep the expression tier.  Ratios and rounding are Catalyst in both
    tiers — value-identical (equality-tested), oracle unchanged."""
    from maple_spark.pipelines.dedup import CARRY_SETS_MAX_BYTES, _arrow_available

    big_input = False
    if _arrow_available():
        from maple_spark.pipelines.util import parquet_files_stats

        stats = parquet_files_stats(docs)
        big_input = stats is None or stats[0] > CARRY_SETS_MAX_BYTES
    if big_input:
        c = _rep_counts_arrow_udf()(F.col(text_col))
        n_words = c["nw"]
        n_bigrams = F.when(c["nw"] >= 2, c["nw"] - 1).otherwise(0)
        return docs.select(
            "*",
            F.round(
                c["ndw"].cast("double") / F.greatest(n_words, F.lit(1)), 6
            ).alias("distinct_word_ratio"),
            F.round(
                c["ndb"].cast("double") / F.greatest(n_bigrams, F.lit(1)), 6
            ).alias("distinct_bigram_ratio"),
            F.round(
                c["top"].cast("double") / F.greatest(n_words, F.lit(1)), 6
            ).alias("top_word_share"),
        )
    words = F.split(F.col(text_col), " ")
    bigrams = _word_ngrams(text_col, 2)
    n_words = F.size(words)
    n_bigrams = F.size(bigrams)
    # top word count via an Arrow-batched pandas_udf — the ONE Python
    # kernel in the curation pass, and a measured decision, not a
    # shortcut.  Catalyst formulations were tried and are pathological:
    # the original transform-over-distinct (count each distinct word
    # with filter+size) is O(u·w) per row in an INTERPRETED lambda
    # (higher-order-function lambdas run outside whole-stage codegen),
    # and the two linear-shaped rewrites measured even worse because a
    # lambda re-evaluates captured outer expressions per element:
    # aggregate() run-length fold over sort_array = 12 s for ONE
    # 10k-word doc; boundary-index filter over sequence() = 92 s (each
    # element_at(sort_array(words), i) re-sorts).  The Arrow kernel is
    # C-speed split + Counter: ~10 ms for a 100k-word doc, linear, and
    # still MAP-ONLY — the explode→groupBy(id, word) alternative would
    # shuffle every distinct (doc, word) of the corpus and join-back
    # (re-executing the upstream lineage per consumer), a full-corpus
    # shuffle for what is a per-row signal.
    top_count = _top_word_count(F.col(text_col))
    return docs.select(
        "*",
        F.round(
            F.size(F.array_distinct(words)).cast("double")
            / F.greatest(n_words, F.lit(1)),
            6,
        ).alias("distinct_word_ratio"),
        F.round(
            F.size(F.array_distinct(bigrams)).cast("double")
            / F.greatest(n_bigrams, F.lit(1)),
            6,
        ).alias("distinct_bigram_ratio"),
        F.round(
            top_count.cast("double") / F.greatest(n_words, F.lit(1)), 6
        ).alias("top_word_share"),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals:

    - ``distinct_word_ratio``  = |set(words)| / |words|
    - ``distinct_bigram_ratio``= |set(bigrams)| / |bigrams|
    - ``top_word_share``       = count(most frequent word) / |words|

    Low distinct ratios / high top share ⇒ boilerplate, keyword spam, or
    looping generation — standard pre-training quality filters.  Every
    signal is computed over one row (ratios in Catalyst, top share in an
    Arrow kernel): map-only at any corpus size, linear in doc length.
    """
    return with_repetition_stats(_spread(docs), text_col).select(
        F.col(id_col),
        "distinct_word_ratio",
        "distinct_bigram_ratio",
        "top_word_share",
    )


def with_pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Column-appending form of :func:`pii_scrub` (see
    :func:`with_repetition_stats` for why): input columns plus
    n_emails / n_phones / scrubbed_text."""
    t = F.col(text_col)
    return docs.select(
        "*",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("scrubbed_text"),
    )


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Count and mask email/phone literals:
    (id, n_emails, n_phones, scrubbed_text).

    Masking replaces matches with fixed tags so downstream dedup/token
    counts stay deterministic.  Map-only; the regexes stick to character
    classes so Java and the DuckDB oracle agree byte-for-byte.
    """
    return with_pii_scrub(_spread(docs), text_col).select(
        F.col(id_col), "n_emails", "n_phones", "scrubbed_text"
    )


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Just the ids of contaminated documents — the filter-pipeline form
    of :func:`decontaminate`.  The result is bounded by actual benchmark
    leakage (small at any corpus scale), so a caller can broadcast it
    into a left-anti join instead of join-backing a corpus-sized
    report."""
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(word_ngrams_best(text_col, n, df=docs)).alias("gram"),
    )
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams_best(text_col, n, df=benchmark)).alias("gram")
        ).distinct()
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), on="gram", how="left_semi")
        .select(id_col)
        .distinct()
    )


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 15,
) -> DataFrame:
    """Exact duplicated-span report: per document, how many of its word
    ``n``-gram positions carry a span that also appears in ANOTHER
    document — the corpus-level exact-substring-dedup signal (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better": repeated >= n-token spans are the memorization/dup driver
    that document-level dedup misses).  Output:
    (id, n_spans, n_dup_spans, dup_span_frac) with dup_span_frac NULL
    for docs shorter than ``n`` words.

    Cross-doc only by design: a span repeated purely inside one doc is
    within-document boilerplate — ``repetition_stats``'s job.

    100 TB shape: the gram stream is reduced to the portable 60-bit
    fingerprint (``functions/phash.py``) at the map side, so the first
    corpus-wide shuffle carries fixed-width (id, h, partial count) rows
    with map-side combine — never span text.  The cross-doc test is a
    COUNT() window over h on the (doc, h) table (one row per doc per
    distinct gram, so the plain count IS the distinct-doc count): a
    single linear lineage — no gram-table self-join whose two
    differently-pruned consumers would re-execute the explode+md5 map
    stage (exchange reuse only dedups byte-identical exchanges).
    WindowExec does sort its input by h within partitions even with no
    ORDER BY (requiredChildOrdering is the partition spec) — an
    O(n log n) per-partition sort of fixed-width (id, h, c) rows,
    accepted deliberately: the sort-free alternative (groupBy(h) with
    collect_list of ids, then explode back) materializes one row per
    distinct gram holding ALL its doc ids — a single boilerplate gram
    shared by 10^7 docs becomes one 10^7-element array in one task,
    the mega-bucket trap.  The sort degrades gracefully on exactly the
    skew that breaks the alternative.  Per-doc span totals
    come map-side from the word count (no extra pass over the grams).
    The md5 fingerprint makes the whole pipeline replayable in vanilla
    DuckDB SQL — the oracle is value-exact, collisions included
    (p ~ 2^-60)."""
    from pyspark.sql import Window

    from maple_spark.functions import phash

    # shuffle 1: per-(doc, gram-fingerprint) occurrence counts
    gc = (
        _spread(docs)
        .select(
            F.col(id_col),
            F.explode(
                word_ngrams_best(text_col, n, filter_empty=True, df=docs)
            ).alias("gram"),
        )
        .select(F.col(id_col), phash.fp60(F.col("gram")).alias("h"))
        .groupBy(id_col, "h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # shuffle 2 (by h): docs-per-gram window; shuffle 3 (by id): per-doc
    # duplicated-span totals, bounded by actual cross-doc duplication
    dup_per_doc = (
        gc.withColumn(
            "n_docs", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .where(F.col("n_docs") >= 2)
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_dup_spans"))
    )
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda x: x != "",
    )
    n_spans = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0)).cast("bigint")
    return (
        docs.select(F.col(id_col), n_spans.alias("n_spans"))
        .join(dup_per_doc, id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias(
                "n_dup_spans"
            ),
            F.when(
                F.col("n_spans") > 0,
                F.round(
                    F.coalesce("n_dup_spans", F.lit(0)) / F.col("n_spans"), 6
                ),
            ).alias("dup_span_frac"),
        )
    )


#: Gopher rule A1.1's "must contain at least 2 of" stopword list
#: (Rae et al. 2021) — the 8 words are part of the published rule.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The Gopher quality-rule gate (Rae et al. 2021 Appendix A1.1 —
    the doc-level heuristic filter FineWeb/RefinedWeb-style pipelines
    run before model-based scoring; defaults are the published
    thresholds): word count in [min_words, max_words], mean word
    length in [3, 10] chars, symbol-to-word ratio ('#' or '...')
    <= 0.1, <= 90% of lines starting with a bullet, <= 30% of lines
    ending in an ellipsis, >= 80% of words containing an alphabetic
    character, and >= 2 distinct stopwords present.

    Returns (id, n_words, mean_word_len, symbol_word_ratio,
    bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
    n_stop_hits, keep) — the signal columns so a pipeline can tune
    thresholds from the measured distributions, plus the composite
    ``keep``.  NULL/wordless docs surface NULL signals and keep=false
    (a gate must decide; the bpe2 NULL-surfacing contract for the
    metrics themselves).

    Scale shape: map-only — every signal is computed from the row's
    own text (split + higher-order filter/concat_ws length sums +
    regexp_count, all Catalyst expressions; the per-word lambdas run
    interpreted but row-local and linear in doc length).  Zero
    exchanges at any corpus size; the cheapest filter in the pipeline
    and the reason production runs it FIRST."""
    t = F.col(text_col)
    words = F.filter(F.split(t, " "), lambda x: x != "")
    lines = F.split(t, "\n")
    n_words = F.size(words)
    # Σ word lengths via concat_ws — stays in codegen (no aggregate()
    # lambda); mean/ratios only defined when the doc has words, so the
    # 0/0 regime can't diverge cross-engine
    sum_chars = F.length(F.concat_ws("", words))
    n_symbols = F.regexp_count(t, F.lit("#")) + F.regexp_count(
        t, F.lit(r"\.\.\.")
    )
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: l.startswith("- ")
            | l.startswith("* ")
            | l.startswith("•"),
        )
    )
    n_ellipsis = F.size(F.filter(lines, lambda l: l.endswith("...")))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(stop_arr, lambda s: F.array_contains(words, s)))
    has = n_words > 0
    mean_len = F.when(has, sum_chars / n_words)
    sym_ratio = F.when(has, n_symbols / n_words)
    bullet_ratio = F.when(has, n_bullet / n_lines)
    ellipsis_ratio = F.when(has, n_ellipsis / n_lines)
    alpha_ratio = F.when(has, n_alpha / n_words)
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len)
        & (sym_ratio <= max_symbol_word_ratio)
        & (bullet_ratio <= max_bullet_line_ratio)
        & (ellipsis_ratio <= max_ellipsis_line_ratio)
        & (alpha_ratio >= min_alpha_word_ratio)
        & (F.when(has, n_stop) >= min_stop_hits)
    )
    # ``carry_cols`` ride through unchanged (the lsh_band_buckets_rowlocal
    # pattern): the gate is row-local, so a pipeline that needs the text
    # (or any other column) PAST the gate can filter in place instead of
    # joining the kept ids back to the source — at 100 TB that join is a
    # second increment scan plus an increment-sized shuffle/broadcast for
    # what is semantically a map-only predicate (round-12 optimization;
    # cp6 was the offender).  Default () keeps every existing caller's
    # output byte-identical.
    return docs.select(
        F.col(id_col),
        *carry_cols,
        F.when(has, n_words).cast("bigint").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_line_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_line_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        F.when(has, n_stop).cast("bigint").alias("n_stop_hits"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )
