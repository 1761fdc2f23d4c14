"""Text analysis operators over the ``documents`` table.

All computed with built-in Catalyst expressions (split / regexp / length /
aggregate) — zero Python in the row path, so the whole stage codegens and a
100 TB corpus is a single map-only pass (no shuffle at all unless the caller
aggregates).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maple_spark.pipelines.util import checkpoint_df, spread

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
    docs: DataFrame, text_col: str = "text", k: int = 5, strict: bool = False
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
    merges are intra-word either way because sequences are per word.

    Words containing the structural ``|`` delimiter are EXCLUDED from
    learning by default — silent on pipe-heavy corpora (code, markdown
    tables).  ``strict=True`` raises on the first such word instead, so
    budget consumers can choose loud failure over silent undercount."""
    spark = docs.sparkSession
    wf = _bpe_word_table(docs, text_col, strict=strict)
    out_rows, _ = _bpe_distributed_rounds(wf, k, start_rank=1)
    return spark.createDataFrame(
        out_rows, _BPE_MERGE_SCHEMA
    )


_BPE_MERGE_SCHEMA = (
    "merge_rank int, left_sym string, right_sym string, pair_count bigint"
)


def _bpe_word_table(
    docs: DataFrame, text_col: str, strict: bool = False
) -> DataFrame:
    """The ONE corpus-proportional pass shared by every BPE tier: the
    word-count shuffle (map-side partials) producing the distinct-word
    table (seq, freq), localCheckpointed so the merge rounds never
    re-scan the corpus."""
    words = docs.where(F.col(text_col).isNotNull()).select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    if strict:
        words = words.withColumn(
            "w",
            F.when(
                F.col("w").contains("|"),
                F.raise_error(
                    F.concat(
                        F.lit("bpe_merges(strict): word contains the "),
                        F.lit("structural '|' delimiter: "),
                        F.col("w"),
                    )
                ),
            ).otherwise(F.col("w")),
        )
    words = words.where((F.length("w") > 0) & (~F.col("w").contains("|")))
    return (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(
            F.regexp_replace("w", "(?s)(.)", r"|$1|").alias("seq"), "freq"
        )
        .localCheckpoint(eager=True)
    )


def _bpe_distributed_rounds(
    wf: DataFrame,
    k: int,
    start_rank: int = 1,
    checkpoint_every: int | None = None,
) -> tuple[list[tuple], DataFrame]:
    """Run up to ``k`` distributed merge rounds over the word table and
    return (merge rows, final word table).  Each round: one vocab-sized
    pair-explode + sum shuffle, a ONE-ROW argmax collect, and a codegen
    replace() rewrite.  ``checkpoint_every`` bounds the replace-chain
    plan depth for long runs (the hybrid tier's distributed leg): every
    N rounds the table is re-checkpointed with fully-merged words
    (single-symbol sequences — they can never contribute a pair again)
    dropped, which is what makes the table SHRINK as frequent words
    collapse."""
    pair_expr = (
        "explode(zip_with("
        "  slice(syms, 1, size(syms) - 1),"
        "  slice(syms, 2, size(syms) - 1),"
        "  (a, b) -> struct(a AS l, b AS r)))"
    )
    out_rows = []
    cur = wf
    for i, rank in enumerate(range(start_rank, start_rank + k)):
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
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            cur = cur.where(
                F.col("seq").contains("||")  # ≥2 symbols ⇔ has a pair
            ).localCheckpoint(eager=True)
    return out_rows, cur


def _bpe_driver_merges(
    word_freqs: list[tuple[str, int]], k: int, start_rank: int = 1
) -> list[tuple]:
    """Driver-local BPE merge loop over a collected word table — the
    Sennrich incremental algorithm on the SAME ``|...|`` wrapper-encoded
    strings the distributed tier uses: each round's rewrite is literally
    ``str.replace('|l||r|', '|lr|')`` (C speed, and the exact greedy
    left-to-right non-overlapping semantics of Spark/DuckDB ``replace()``
    by construction), and the pair counts are updated SITE-LOCALLY —
    only the neighbor pairs around each merge site change, so a round
    costs O(merge sites), not O(vocabulary · word length).  The argmax
    is a lazy-deletion heap whose entry order (-cnt, l, r) IS the
    distributed tie-break (cnt DESC, l ASC, r ASC) — Python's code-point
    string order matches DuckDB's binary UTF-8 collation exactly, and
    Spark's UTF-16 comparison agrees on all BMP text (supplementary-
    plane symbols could order differently vs Java, the same caveat the
    distributed tie-break already carries vs DuckDB).  Equality with
    the distributed rounds is pinned at k=64 on the sf0.01 fixture.

    Site-local update rules (overlap-safe, mirroring replace()):
    subtract the old (prev, l) for every site, and (r, next) only when
    the next site is NOT immediately adjacent (adjacent sites share
    that old pair — the previous site's next IS this site's prev, one
    subtraction total); add (prev_new, lr) where prev_new is the merged
    symbol when the previous site is adjacent, and (lr, next) only for
    non-adjacent next sites (an adjacent pair of sites contributes the
    single new pair (lr, lr) via the second site's prev-add).  The
    merged pair's own entry is popped wholesale after the round — the
    greedy rewrite leaves no (l, r) adjacency anywhere, including the
    counted-but-unmerged overlap occurrences ('aaa' counts (a,a)
    twice, merges once, and afterwards contains none)."""
    import heapq
    from collections import defaultdict

    stats: dict[tuple[str, str], int] = defaultdict(int)
    indices: dict[tuple[str, str], set[int]] = defaultdict(set)
    words: list[list] = []  # [seq_string, freq]
    for wid, (seq, freq) in enumerate(word_freqs):
        words.append([seq, freq])
        syms = seq[1:-1].split("||")
        for pair in zip(syms, syms[1:]):
            stats[pair] += freq
            indices[pair].add(wid)

    heap = [(-cnt, l, r) for (l, r), cnt in stats.items()]
    heapq.heapify(heap)
    out: list[tuple] = []
    for rank in range(start_rank, start_rank + k):
        best = None
        while heap:
            negcnt, l, r = heapq.heappop(heap)
            if -negcnt > 0 and stats.get((l, r), 0) == -negcnt:
                best = (l, r, -negcnt)
                break
        if best is None:
            break
        l, r, cnt = best
        out.append((rank, l, r, cnt))
        pat, rep, lr = f"|{l}||{r}|", f"|{l}{r}|", l + r
        lp = len(pat)
        touched: set[tuple[str, str]] = set()
        for wid in indices.pop((l, r), ()):
            seq, freq = words[wid]
            sites: list[int] = []
            idx = seq.find(pat)
            while idx != -1:
                sites.append(idx)
                idx = seq.find(pat, idx + lp)
            if not sites:  # stale index entry (pair gone via earlier merge)
                continue
            n = len(seq)
            for si, s in enumerate(sites):
                adj_prev = si > 0 and sites[si - 1] == s - lp
                adj_next = si + 1 < len(sites) and sites[si + 1] == s + lp
                if s > 0:
                    prev_old = seq[seq.rfind("|", 0, s - 1) + 1 : s - 1]
                    p = (prev_old, l)
                    stats[p] -= freq
                    touched.add(p)
                    p = (lr if adj_prev else prev_old, lr)
                    stats[p] += freq
                    touched.add(p)
                    indices[p].add(wid)
                if s + lp < n and not adj_next:
                    nxt = seq[s + lp + 1 : seq.index("|", s + lp + 1)]
                    p = (r, nxt)
                    stats[p] -= freq
                    touched.add(p)
                    p = (lr, nxt)
                    stats[p] += freq
                    touched.add(p)
                    indices[p].add(wid)
            words[wid][0] = seq.replace(pat, rep)
        stats.pop((l, r), None)
        touched.discard((l, r))
        for pair in touched:
            c = stats.get(pair, 0)
            if c > 0:
                heapq.heappush(heap, (-c, pair[0], pair[1]))
    return out


def bpe_merges_hybrid(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    driver_rows: int = 2_000_000,
    checkpoint_every: int = 8,
    strict: bool = False,
) -> DataFrame:
    """BPE vocabulary induction at REAL vocab sizes (k ≈ 30k): same
    semantics and output as :func:`bpe_merges` (equality-tested), but
    the merge loop switches tiers on the size of the distinct-word
    table instead of paying ~0.13 s of fixed scheduling per round for
    all k rounds (SCALE.md's bpe regime bound — k=30k would be ~65 min
    of pure overhead that no cluster shrinks):

    1. The corpus-proportional work is unchanged: ONE word-count
       shuffle producing the distinct-word table (vocabulary-sized).
    2. DISTRIBUTED rounds run while that table exceeds ``driver_rows``
       — each round is the same vocab-sized pair-sum + 1-row argmax as
       :func:`bpe_merges`, and every ``checkpoint_every`` rounds the
       table is re-checkpointed with fully-merged (single-symbol)
       words dropped, so it shrinks as frequent words collapse.
    3. Once the table fits (``<= driver_rows`` rows — bounded driver
       metadata by the caller's own threshold, the same contract as
       sim4's k×d centroids), it is collected ONCE and the remaining
       merges finish DRIVER-LOCAL with the incremental pair-count
       algorithm (:func:`_bpe_driver_merges`) — per-round cost there is
       proportional to the words containing the merged pair, i.e.
       microseconds, not a Spark job.

    On a 100 TB corpus the distinct-word table after frequency
    accumulation is typically tens of millions of rows — a few
    distributed rounds in, the single-symbol drop + the skew of Zipf
    means it crosses any reasonable ``driver_rows`` quickly; on test
    scales it collects immediately and the whole k=1024 run is
    sub-minute (measured in SCALE.md)."""
    spark = docs.sparkSession
    wf = _bpe_word_table(docs, text_col, strict=strict)
    out_rows: list[tuple] = []
    cur = wf
    rank = 1
    remaining = cur.count()
    while rank <= k and remaining > driver_rows:
        step = min(checkpoint_every, k - rank + 1)
        # the helper's end-of-window prune+checkpoint (checkpoint_every=
        # step fires it exactly once, after the last round) bounds the
        # replace-chain plan depth AND shrinks the table toward the
        # driver threshold — one shared implementation, not an inline
        # copy (review finding, round 10)
        rows, cur = _bpe_distributed_rounds(
            cur, step, start_rank=rank, checkpoint_every=step
        )
        out_rows.extend(rows)
        rank += step
        if len(rows) < step:  # corpus ran out of mergeable pairs
            rank = k + 1
            break
        remaining = cur.count()
    if rank <= k:
        collected = cur.where(F.col("seq").contains("||")).collect()
        word_freqs = [(r["seq"], r["freq"]) for r in collected]
        out_rows.extend(
            _bpe_driver_merges(word_freqs, k - rank + 1, start_rank=rank)
        )
    return spark.createDataFrame(out_rows, _BPE_MERGE_SCHEMA)


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    excluded_col: str | None = None,
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
    sim4's centroids.

    Delimiter-bearing words count as 0 tokens — a silent undercount on
    pipe-heavy corpora.  ``excluded_col`` surfaces it: when set, the
    output carries that extra column with the per-document count of
    excluded words, so budget consumers can SEE when the structural
    exclusion is material (same partial-agg shape, no extra shuffle)."""
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
    aggs = [F.sum("__wc").alias("n_tokens")]
    cols = [F.col(id_col), word_cnt]
    if excluded_col is not None:
        cols.append(
            w.contains("|").cast("bigint").alias("__excl")
        )
        aggs.append(F.sum("__excl").alias(excluded_col))
    counts = words.select(*cols).groupBy(id_col).agg(*aggs)
    out = docs.select(id_col).join(counts, id_col, "left")
    if excluded_col is not None:
        # NULL-text docs have no exploded words: excluded count is 0,
        # n_tokens stays NULL (the documented NULL-text contract)
        out = out.withColumn(
            excluded_col, F.coalesce(F.col(excluded_col), F.lit(0))
        )
    return out


#: Row-count gate for hinting a vocabulary table broadcast.  At gate scale
#: a unigram vocab is ~10^4-10^6 rows and the hint keeps the known-good
#: broadcast plan without waiting for AQE's shuffle statistics; a 100 TB
#: web corpus's vocabulary (Heaps' law: billions of distinct tokens) must
#: NOT be force-broadcast into Spark's 8 GB broadcast / driver-memory wall
#: (the same trap the round-5 review removed from verify_jaccard), so above
#: the gate the join is left UN-hinted and AQE picks broadcast-vs-shuffle
#: from measured sizes.  4M rows ≈ low hundreds of MB in the broadcast hash
#: relation — comfortably inside a 4 GiB driver, an order of magnitude
#: under the hard wall.
VOCAB_BROADCAST_MAX_ROWS = 4_000_000


def vocab_hint(df: DataFrame, n_rows: int | None) -> DataFrame:
    """Broadcast-hint a vocabulary-sized table only when its recorded row
    count is under :data:`VOCAB_BROADCAST_MAX_ROWS`; unknown or large
    vocabularies return the frame un-hinted (AQE broadcasts-while-small
    at runtime, shuffles when genuinely huge)."""
    if n_rows is not None and n_rows <= VOCAB_BROADCAST_MAX_ROWS:
        return F.broadcast(df)
    return df


#: Context-column spec per stupid-backoff order: (name, distance) pairs,
#: farthest first — order 2 sees the previous token, order 3 the previous
#: two, order 5 the previous four (the production CCNet gate's order:
#: Wenzek et al. 2020 score with a 5-gram KenLM).
LM_CTX: dict[int, list[tuple[str, int]]] = {
    1: [],
    2: [("prev", 1)],
    3: [("p2", 2), ("p1", 1)],
    4: [("p3", 3), ("p2", 2), ("p1", 1)],
    5: [("p4", 4), ("p3", 3), ("p2", 2), ("p1", 1)],
}


def lm_positions(
    docs: DataFrame,
    ctx: list[tuple[str, int]],
    id_col: str | None = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id?, *ctx_names, cur) token-position rows — ONE posexplode with
    every context column pulled from the SAME row's token array via
    ``element_at`` (no self-join, no per-doc window sort).  The single
    tokenize/explode definition shared by the inline backoff tiers
    (t20/t21/t22) and the snapshot build/score paths, so they cannot
    drift on the empty-token / NULL-text rules (NULL texts drop here and
    re-surface as NULL scores via the caller's left join — the bpe2
    contract).  ``id_col=None`` omits the id (the snapshot BUILD needs
    only global n-gram counts)."""
    ids = [id_col] if id_col is not None else []
    arr = F.filter(F.split(text_col, " "), lambda x: x != "")
    # spread BEFORE tokenizing so the split/posexplode/element_at map
    # work parallelizes on a single-row-group local fixture (spread is
    # a no-op at scale — many input files — and on in-memory stream
    # batches); without it every LM tier's checkpoint build ran its
    # corpus explode on one core (optimization round 12, guide §2.5
    # input-skew note)
    toks = (
        spread(docs.where(F.col(text_col).isNotNull()).select(*ids, text_col))
        .select(*ids, arr.alias("arr"))
        .where(F.size("arr") > 0)
    )
    return toks.select(
        *ids, "arr", F.posexplode("arr").alias("i", "cur")
    ).select(
        *ids,
        *[
            F.when(
                F.col("i") >= n, F.element_at("arr", F.col("i") - (n - 1))
            ).alias(name)
            for name, n in ctx
        ],
        "cur",
    )


def lm_score_agg(
    docs: DataFrame, joined: DataFrame, term, id_col: str = "doc_id"
) -> DataFrame:
    """Shared per-doc scoring aggregate for the backoff tiers: n_words,
    OOV token count (cur missing from the train vocab — ``cnt_cur`` NULL),
    and the DECIMAL(38,12) order-independent Σ m·term with the final
    round(6) (the t19 exactness discipline), NULL-surfacing
    wordless/NULL docs via the left join (the bpe2 contract)."""
    scored = (
        joined.groupBy(id_col)
        .agg(
            F.sum("m").alias("_n"),
            F.sum(
                F.when(F.col("cnt_cur").isNull(), F.col("m")).otherwise(F.lit(0))
            ).alias("_oov"),
            F.sum(
                (F.col("m").cast("double") * term).cast("decimal(38,12)")
            ).alias("_slc"),
        )
        .select(
            id_col,
            F.col("_n").cast("bigint").alias("n_words"),
            F.col("_oov").cast("bigint").alias("n_oov"),
            F.round(
                -F.col("_slc").cast("double") / F.col("_n"), 6
            ).alias("xent"),
        )
    )
    return docs.select(id_col).join(scored, id_col, "left")


#: per-order model count-column names, orders 2..5
LM_CNT_COLS = {2: "bcnt", 3: "tcnt", 4: "qcnt", 5: "pcnt"}


def lm_backoff_join(
    wcb: DataFrame,
    uv: DataFrame,
    total: DataFrame,
    n_vocab: int | None,
    order: int,
    models: dict[int, DataFrame],
):
    """The ONE definition of the stupid-backoff model-join pyramid and
    scoring term, shared by the inline tiers (t20-t23) and the
    snapshot scorer :func:`lm_score` — three hand-kept copies of this
    ~80-line construction had to stay byte-consistent for the
    shared-oracle equality contract, the exact drift class
    :func:`lm_positions`/:func:`lm_score_agg` were factored out to
    prevent (round-12 review).

    ``wcb``: (…, *ctx_names, cur, m) position-count rows.  ``uv``:
    (w, cnt) unigram vocab — joined twice under :func:`vocab_hint`'s
    size gate (cur probability + nearest-context denominator).
    ``models[n]`` for n = 2..order: the n-gram table with columns
    (ctx_names[-(n-1):], cur, LM_CNT_COLS[n]) — each joined ONCE for
    its probability and (below the top order) ONCE shifted one
    position back as the (n+1)-gram's denominator; all model joins are
    deliberately UN-hinted (an n-gram table may not broadcast at any
    corpus size).  Returns (joined, term): the joined frame with the
    1-row total attached (broadcast) and the order-deep backoff term —
    feed both to :func:`lm_score_agg`."""
    names = [n for n, _ in LM_CTX[order]]
    near = names[-1]
    # NO .drop() hygiene anywhere in the pyramid (optimization round
    # 12): every drop()/rename on a Dataset re-runs Catalyst ANALYSIS
    # over the whole join tree so far, and at order 5 the seven drops
    # cost ~3.5 s of pure DRIVER time per construction (measured
    # steady-state: 4.5 s → 0.9 s without them; the bench clock covers
    # construction for every CONSTRUCT_TIMED LM tier).  The join-helper
    # columns (__w/__pw/__s{n}_{i}/__sc{n}) get per-order-unique names
    # instead, stay in the frame, and Catalyst's column pruning removes
    # them physically — the executed plan is identical (value-equality
    # and the per-tier plan censuses pin this).
    j = (
        wcb.join(
            vocab_hint(
                uv.select(F.col("w").alias("__w"), F.col("cnt").alias("cnt_cur")),
                n_vocab,
            ),
            F.col("cur") == F.col("__w"),
            "left",
        )
        .join(
            vocab_hint(
                uv.select(F.col("w").alias("__pw"), F.col("cnt").alias("cnt_p1")),
                n_vocab,
            ),
            F.col(near) == F.col("__pw"),
            "left",
        )
    )
    for n in range(2, order + 1):
        cnt_col = LM_CNT_COLS[n]
        keys = names[-(n - 1):]
        j = j.join(models[n], keys + ["cur"], "left")
        if n < order:
            # the (n+1)-gram's denominator: this model shifted one
            # position back — keys match names[-n:-1], cur matches the
            # nearest context
            wkeys = names[-n:-1]
            tmp = [f"__s{n}_{i}" for i in range(len(keys))] + [f"__sc{n}"]
            shifted = models[n].select(
                *[F.col(k).alias(t) for k, t in zip(keys, tmp[:-1])],
                F.col("cur").alias(tmp[-1]),
                F.col(cnt_col).alias(f"{cnt_col}_ctx"),
            )
            cond = F.col(near) == F.col(tmp[-1])
            for wk, t in zip(wkeys, tmp[:-1]):
                cond = cond & (F.col(wk) == F.col(t))
            j = j.join(shifted, cond, "left")
    lntot = F.log(F.col("total").cast("double"))
    chains = [
        F.log(F.coalesce(F.col("cnt_cur"), F.lit(1)).cast("double")) - lntot
    ]
    denoms = {2: F.col("cnt_p1")}
    for n in range(3, order + 1):
        denoms[n] = F.col(f"{LM_CNT_COLS[n - 1]}_ctx")
    for n in range(2, order + 1):
        chains.append(
            F.when(
                F.col(LM_CNT_COLS[n]).isNotNull(),
                F.log(F.col(LM_CNT_COLS[n]).cast("double"))
                - F.log(denoms[n].cast("double")),
            ).otherwise(F.log(F.lit(0.4)) + chains[-1])
        )
    term = None
    for i, name in enumerate(reversed(names)):
        # position scores with the longest chain its prefix affords:
        # p1 NULL -> unigram, p2 NULL -> bigram chain, ...
        branch = F.when(F.col(name).isNull(), chains[i])
        term = branch if term is None else term.when(
            F.col(name).isNull(), chains[i]
        )
    term = term.otherwise(chains[-1])
    return j.crossJoin(F.broadcast(total)), term


def build_lm_snapshot(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    order: int = 1,
    min_count: int = 1,
) -> None:
    """Persist a stupid-backoff LM of the given ``order`` fit on ``docs``
    — the reference-corpus half of the CCNet gate (Wenzek et al. 2020
    fit on Wikipedia, score the crawl; Brants et al. 2007 define stupid
    backoff): ``{path}/vocab.parquet`` (w, cnt),
    ``{path}/bigram.parquet`` (prev, cur, bcnt) for order ≥ 2,
    ``{path}/trigram.parquet`` (p2, p1, cur, tcnt) for order ≥ 3,
    ``{path}/fourgram.parquet`` / ``{path}/fivegram.parquet`` one key
    column wider each for order ≥ 4 / 5 (order 5 IS the production
    gate's order), and
    ``{path}/meta.parquet`` (one row: total, n_vocab, order — derived
    from the PERSISTED vocab so the files cannot disagree; n_vocab
    drives :func:`vocab_hint`'s broadcast gate, order tells
    :func:`lm_score` which backoff chain to plan).  Built once per
    reference snapshot; the scorer and any number of streaming ingest
    gates read the parquet — the same amortization contract as
    ``dedup.build_reference_snapshot`` / ``similarity.build_ivf_snapshot``.
    ONE corpus explode + ONE corpus-sized shuffle (to the widest
    fixed-width count table, eagerly checkpointed); every model table
    re-aggregates that table with map-side combine, so the corpus is
    scanned once no matter the order.  Every output is
    vocabulary/n-gram-table-sized, never corpus-sized.

    ``min_count`` prunes the HIGHER-ORDER model tables (bigram and up)
    to n-grams seen at least that often — the standard KenLM-style
    size lever (Heafield 2011 prunes singletons by default): on web
    text most distinct n-grams above order 2 are singletons, so
    ``min_count=2`` shrinks the 3/4-gram tables severalfold, which at
    100 TB is the difference between a model table that joins
    shuffle-side comfortably and one that dominates the snapshot.
    Pruned n-grams simply back off (α·shorter-context), exactly as if
    unseen — the scorer needs no flag, and the UNIGRAM vocab is never
    pruned (it is the backoff floor and the OOV definition).  Default 1
    = exact counts (the value-exact-oracle configuration)."""
    if order not in LM_CTX:
        raise ValueError(f"order must be one of {sorted(LM_CTX)}, got {order}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if order == 1:
        wc = (
            docs.where(F.col(text_col).isNotNull())
            .select(F.explode(F.split(text_col, " ")).alias("w"))
            .where(F.col("w") != "")
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    else:
        # ONE corpus explode + ONE corpus-sized shuffle, to the widest
        # fixed-width count table, eagerly checkpointed — every model
        # table then derives by RE-AGGREGATING that table, never the
        # corpus (round-12 review: the previous per-model formulation
        # re-ran the tokenize+posexplode lineage once per .write — ~5
        # corpus scans at order 5, at the 100 TB fit-once scale this
        # function exists for).  The build never touches doc ids — the
        # model is global counts.
        names = [n for n, _ in LM_CTX[order]]
        g = checkpoint_df(
            lm_positions(docs, LM_CTX[order], None, text_col)
            .groupBy(*names, "cur")
            .agg(F.count(F.lit(1)).alias("cnt")),
            eager=True,
        )
        wc = g.groupBy(F.col("cur").alias("w")).agg(F.sum("cnt").alias("cnt"))

        # pruning is NaN-safe by construction: a surviving n-gram's
        # context (n-1)-gram count is >= its own count (every
        # occurrence of the n-gram contains the context), so the
        # scorer's denominator joins can never see a pruned context
        # under the SAME threshold (proved per-order in
        # tests/test_pipelines.py::test_lm_snapshot_min_count_prunes)
        def _prune(model: DataFrame, cnt_col: str) -> DataFrame:
            if min_count > 1:
                return model.where(F.col(cnt_col) >= min_count)
            return model

        p1 = "prev" if order == 2 else "p1"
        writes = [
            (
                "bigram.parquet",
                _prune(
                    g.where(F.col(p1).isNotNull())
                    .groupBy(F.col(p1).alias("prev"), F.col("cur"))
                    .agg(F.sum("cnt").alias("bcnt")),
                    "bcnt",
                ),
            )
        ]
        if order >= 3:
            writes.append(
                (
                    "trigram.parquet",
                    _prune(
                        g.where(F.col("p2").isNotNull())
                        .groupBy("p2", "p1", "cur")
                        .agg(F.sum("cnt").alias("tcnt")),
                        "tcnt",
                    ),
                )
            )
        if order >= 4:
            writes.append(
                (
                    "fourgram.parquet",
                    _prune(
                        g.where(F.col("p3").isNotNull())
                        .groupBy("p3", "p2", "p1", "cur")
                        .agg(F.sum("cnt").alias("qcnt")),
                        "qcnt",
                    ),
                )
            )
        if order >= 5:
            # g IS the five-gram table — no further aggregation
            writes.append(
                (
                    "fivegram.parquet",
                    _prune(
                        g.where(F.col("p4").isNotNull()).select(
                            "p4", "p3", "p2", "p1", "cur",
                            F.col("cnt").alias("pcnt"),
                        ),
                        "pcnt",
                    ),
                )
            )
        writes.append(("vocab.parquet", wc))
        # meta's totals derive from wc — which itself re-aggregates the
        # CHECKPOINTED g — so computing them here costs a
        # vocabulary-sized agg, not a read-back of the just-written
        # vocab.parquet (one fewer sequential job per build; the two
        # formulations cannot disagree because the parquet round-trip
        # of exact longs is lossless).  order is a literal SELECT, not
        # an aggregate over the vocab rows: max(lit(order)) over an
        # EMPTY vocab (an all-NULL / empty-train corpus) is NULL, and
        # lm_score would then plan LM_CTX[None] (fuzz-caught:
        # test_perplexity_family_oracle_agree_on_random_corpora).
        writes.append(
            (
                "meta.parquet",
                wc.agg(
                    F.sum("cnt").alias("total"),
                    F.count(F.lit(1)).alias("n_vocab"),
                ).select(
                    "total",
                    "n_vocab",
                    F.lit(order).alias("order"),
                    # recorded so merge_lm_snapshots can refuse pruned
                    # inputs: prune-then-merge undercounts vs
                    # merge-then-prune
                    F.lit(min_count).alias("min_count"),
                ),
            )
        )
        # every model table re-aggregates the CHECKPOINTED g, so the
        # writes are mutually independent jobs — submit them from a
        # small thread pool so each job's tail back-fills the executors
        # the previous job would have left idle (optimization guide
        # §2.6: actions are only sequential because driver code calls
        # them sequentially).  FIFO scheduling keeps the back-fill
        # behavior; 3 in flight is enough to cover a straggling tail
        # without the jobs fighting for executors.
        from concurrent.futures import ThreadPoolExecutor

        def _write(nm_df):
            nm, df = nm_df
            df.write.mode("overwrite").parquet(f"{path}/{nm}")

        with ThreadPoolExecutor(max_workers=3) as pool:
            list(pool.map(_write, writes))
        return
    wc.write.mode("overwrite").parquet(f"{path}/vocab.parquet")
    spark = docs.sparkSession
    # order-1 meta reads the persisted vocab back (wc's lineage is the
    # corpus scan itself here — re-aggregating it would re-scan the
    # corpus; the written file is the cheap source).  order is a
    # literal SELECT for the same empty-vocab reason as above.
    spark.read.parquet(f"{path}/vocab.parquet").agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_vocab"),
    ).select(
        "total",
        "n_vocab",
        F.lit(order).alias("order"),
        # recorded so merge_lm_snapshots can refuse pruned inputs:
        # prune-then-merge undercounts vs merge-then-prune
        F.lit(min_count).alias("min_count"),
    ).write.mode("overwrite").parquet(f"{path}/meta.parquet")


#: per-order model table file + key layout, orders 2..5 (the merge and
#: any future snapshot tooling iterate this instead of hand-listing)
LM_MODEL_TABLES = {
    2: ("bigram.parquet", ["prev", "cur"], "bcnt"),
    3: ("trigram.parquet", ["p2", "p1", "cur"], "tcnt"),
    4: ("fourgram.parquet", ["p3", "p2", "p1", "cur"], "qcnt"),
    5: ("fivegram.parquet", ["p4", "p3", "p2", "p1", "cur"], "pcnt"),
}


def merge_lm_snapshots(spark, paths: list[str], out: str) -> None:
    """Merge stupid-backoff LM snapshots fit on DISJOINT corpus shards
    into one snapshot equal to a single fit on the union — n-gram
    counts are mergeable partials (plain sums per key), so a 100 TB
    reference can be fit shard-parallel (or refreshed incrementally:
    fit ONLY the new crawl's shard, merge into the standing snapshot)
    without ever re-scanning old shards.  Exactness is the point:
    ``merge(build(A), build(B)) == build(A ∪ B)`` table-for-table
    (pytest pins equality and associativity), so the merged snapshot
    scores bit-identically to a monolithic fit.

    Refuses snapshots of mixed order, and refuses PRUNED inputs
    (min_count > 1 in meta): a shard-pruned n-gram's count is lost, so
    prune-then-merge undercounts vs merge-then-prune — prune once, at
    the END, with build's min_count semantics (re-filter the merged
    tables).  Pre-round-12 snapshots without the recorded min_count
    merge as unpruned (they were built before pruning existed)."""
    if len(paths) < 2:
        raise ValueError("merge_lm_snapshots needs at least two snapshots")
    metas = [spark.read.parquet(f"{p}/meta.parquet").first() for p in paths]
    orders = {(m["order"] if "order" in m else 1) for m in metas}
    if len(orders) != 1:
        raise ValueError(f"cannot merge snapshots of mixed orders {sorted(orders)}")
    order = orders.pop()
    for p, m in zip(paths, metas):
        if "min_count" in m and (m["min_count"] or 1) > 1:
            raise ValueError(
                f"{p} was built with min_count={m['min_count']}: "
                "prune-then-merge undercounts — merge unpruned "
                "snapshots and prune the merged result"
            )
    merged_vocab = (
        functools.reduce(
            DataFrame.unionByName,
            [spark.read.parquet(f"{p}/vocab.parquet") for p in paths],
        )
        .groupBy("w")
        .agg(F.sum("cnt").alias("cnt"))
    )
    merged_vocab.write.mode("overwrite").parquet(f"{out}/vocab.parquet")
    for n in range(2, order + 1):
        fname, keys, cnt_col = LM_MODEL_TABLES[n]
        functools.reduce(
            DataFrame.unionByName,
            [spark.read.parquet(f"{p}/{fname}") for p in paths],
        ).groupBy(*keys).agg(F.sum(cnt_col).alias(cnt_col)).write.mode(
            "overwrite"
        ).parquet(f"{out}/{fname}")
    spark.read.parquet(f"{out}/vocab.parquet").agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_vocab"),
    ).select(
        "total",
        "n_vocab",
        F.lit(order).alias("order"),
        F.lit(1).alias("min_count"),
    ).write.mode("overwrite").parquet(f"{out}/meta.parquet")


def lm_score(
    df: DataFrame,
    lm_snapshot: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a persisted stupid-backoff LM
    (:func:`build_lm_snapshot`) — the snapshot's recorded ``order``
    picks the chain.  Order 1: per-doc cross-entropy
    xent = ln(total) − (Σ k·ln(cnt'))/n in nats, where OOV words score
    cnt' = 1 (n_oov reports how many tokens backed off).  Order ≥ 2
    (Brants et al. 2007): S(w|ctx) = ngram_cnt/ctx_cnt when the n-gram
    was seen in training, else 0.4·S(w|shorter ctx), bottoming out at
    cnt'(w)/total; position i scores with the longest chain its prefix
    affords; xent = −(1/n) Σ ln S.  Returns (id_col, n_words, n_oov,
    xent); NULL/wordless docs surface NULL (the bpe2 contract).

    Scale shape: ONE corpus explode (contexts via ``element_at`` on the
    row's own array — no self-join), aggregated to a fixed-width
    per-doc context table, then model joins.  The vocab joins are
    broadcast-hinted ONLY under :func:`vocab_hint`'s recorded-size gate
    (a Heaps-law vocabulary at 100 TB must not be forced into the 8 GB
    broadcast wall — above the gate AQE decides from measured sizes);
    the bigram/…/fivegram model joins are NEVER hinted (those
    tables may not broadcast at any corpus size by contract); the total
    is a 1-row broadcast READ from the snapshot, never recomputed.
    Cross-engine exactness: per-term ln's as differences of ln(integer
    counts), each m·term in DECIMAL(38,12) before the order-independent
    sum, final round(6) — the t19 discipline.  The streaming binding is
    ``foreachBatch(lambda b, _: sink(lm_score(b, snapshot)))``: scoring
    is batch-local (no cross-row state), so the ingest gate streams with
    ZERO state store — the quality twin of ``cross_dedup_stream``'s
    snapshot guard, equality-tested in tests/test_streaming.py."""
    spark = df.sparkSession
    vocab = spark.read.parquet(f"{lm_snapshot}/vocab.parquet")
    meta = spark.read.parquet(f"{lm_snapshot}/meta.parquet")
    # one driver-side read of the 1-row meta: order picks the plan,
    # n_vocab drives the broadcast gate (absent on pre-round-12
    # snapshots → unknown → un-hinted, the safe-at-scale default)
    mrow = meta.first()
    order = mrow["order"] if "order" in meta.columns else 1
    n_vocab = mrow["n_vocab"] if "n_vocab" in meta.columns else None
    total = meta.select("total")
    if order == 1:
        wc = (
            df.where(F.col(text_col).isNotNull())
            .select(id_col, F.explode(F.split(text_col, " ")).alias("w"))
            .where(F.col("w") != "")
            .groupBy(id_col, "w")
            .agg(F.count(F.lit(1)).alias("k"))
        )
        scored = (
            wc.join(vocab_hint(vocab, n_vocab), "w", "left")
            .crossJoin(F.broadcast(total))
            .groupBy(id_col)
            .agg(
                F.sum("k").alias("_n"),
                F.sum(
                    F.when(F.col("cnt").isNull(), F.col("k")).otherwise(F.lit(0))
                ).alias("_oov"),
                F.sum(
                    (
                        F.col("k").cast("double")
                        * F.log(F.coalesce(F.col("cnt"), F.lit(1)).cast("double"))
                    ).cast("decimal(38,12)")
                ).alias("_slc"),
                F.max("total").alias("_total"),
            )
            .select(
                id_col,
                F.col("_n").cast("bigint").alias("n_words"),
                F.col("_oov").cast("bigint").alias("n_oov"),
                F.round(
                    F.log(F.col("_total").cast("double"))
                    - F.col("_slc").cast("double") / F.col("_n"),
                    6,
                ).alias("xent"),
            )
        )
        return df.select(id_col).join(scored, id_col, "left")
    ctx = LM_CTX[order]
    names = [n for n, _ in ctx]
    wcb = (
        lm_positions(df, ctx, id_col, text_col)
        .groupBy(id_col, *names, "cur")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    near = names[-1]  # nearest context column ("prev" at order 2)
    # each model table is read ONCE and reused for its probability and
    # denominator joins (round-12 review); the pyramid + term are the
    # shared lm_backoff_join definition
    models = {
        2: spark.read.parquet(f"{lm_snapshot}/bigram.parquet").select(
            F.col("prev").alias(near), "cur", "bcnt"
        )
    }
    if order >= 3:
        models[3] = spark.read.parquet(f"{lm_snapshot}/trigram.parquet")
    if order >= 4:
        models[4] = spark.read.parquet(f"{lm_snapshot}/fourgram.parquet")
    if order >= 5:
        models[5] = spark.read.parquet(f"{lm_snapshot}/fivegram.parquet")
    joined, term = lm_backoff_join(wcb, vocab, total, n_vocab, order, models)
    return lm_score_agg(df, joined, term, id_col)
