"""Deterministic sampling / split operators for training-data pipelines.

Random splits are useless at 100 TB: re-runs must land every document in
the same split (resumability, leakage audits), so everything here keys on
a *content-stable hash* of the id, never ``rand()``.

- ``hash_split``: md5-bucket train/valid/test assignment.  md5 (not
  xxhash64) because it is bit-identical across engines — the DuckDB
  oracle computes the same buckets, making the split itself part of the
  correctness gate.
- ``quota_sample``: per-group cap (e.g. at most N docs per language) via
  a rank window over a deterministic order — the class-rebalancing
  primitive.  One shuffle on the group key; skewed groups are bounded by
  the cap itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def md5_draw16(seed_col) -> "F.Column":
    """The engine-portable uniform draw: first 4 hex digits of
    md5(seed_col) as a 16-bit integer in [0, 65536).  ONE definition —
    ``hash_split`` and ``domain_mix`` both build on it, and the DuckDB
    oracles reproduce it verbatim (conv/substring/md5 agree
    byte-for-byte across engines)."""
    return F.conv(F.substring(F.md5(seed_col), 1, 4), 16, 10).cast("bigint")


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Assign each row to train/valid/test by md5(id) bucket in [0, 100).

    The bucket is the 16-bit md5 draw mod 100 — deterministic and
    engine-portable; adding data never reshuffles existing assignments
    (unlike ``rand(seed)`` which depends on partitioning).  The mod-100
    quantization is part of the public contract (bucket IS an output
    column); its residue bias is 1/655 ≈ 0.15% relative on bucket
    frequencies — ±0.012 points on an 80% split (``domain_mix``, whose
    weights need 4-digit precision, compares the raw 16-bit draw
    instead)."""
    bucket = md5_draw16(F.col(id_col).cast("string")) % 100
    split = (
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + valid_pct, "valid")
        .otherwise("test")
    )
    return df.withColumn("bucket", bucket).withColumn("split", split)


def quota_sample(
    df: DataFrame, group_col: str | list[str], order_col: str | list[str], cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per group (single column or composite),
    chosen by ascending ``order_col`` (single or composite — pass a
    composite when the first key can tie, so the kept set is
    deterministic).  The balanced-corpus primitive: cap over-represented
    languages/sources instead of global downsampling."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    orders = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*groups).orderBy(*[F.col(c).asc() for c in orders])
    return (
        df.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= cap)
        .drop("rk")
    )


def domain_mix(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Weighted per-domain subsampling — the corpus-mixing primitive: keep
    each row with its domain's target fraction, decided by a
    content-stable md5 draw in [0, 1) so re-runs and corpus growth never
    flip a document's keep/drop decision (the property ``sample(fraction,
    seed)`` cannot give across partitionings — same argument as
    ``hash_split``).

    The draw reuses the engine-portable md5 formula: the first 4 hex
    digits ARE a uniform 16-bit integer, compared directly against
    ``weight * 65536`` — no modulo, so no residue bias (a ``% 10000``
    draw would over-select residues 0..5535 by 7/6 and skew the kept
    fraction by up to ~3.4 points).  Weight resolution is 1/65536.  The
    draw is salted with the domain so it is independent of the
    train/valid/test split draw.  Map-only: no shuffle at any scale.
    Weights > 1 mean "keep everything" (upsampling/repetition is the
    sequence-packing layer's job, not the filter's).
    """
    draw = md5_draw16(
        F.concat_ws("|", F.col(domain_col), F.col(id_col).cast("string"))
    )
    weight = F.lit(default_weight)
    for dom, w in sorted(weights.items()):
        weight = F.when(F.col(domain_col) == dom, F.lit(w)).otherwise(weight)
    return (
        df.withColumn("mix_draw", draw)
        .withColumn("mix_weight", weight)
        .where(F.col("mix_draw") < F.col("mix_weight") * 65536)
        .drop("mix_draw", "mix_weight")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.5,
    budget: int = 1000,
) -> DataFrame:
    """Temperature-based mixture sampling — the multilingual-pretraining
    rebalance (XLM-R / mBERT α-sampling): per-group quotas ∝ n_g^α of a
    total row ``budget``, where n_g is the observed group size.  α = 1
    keeps natural proportions, α → 0 approaches uniform-per-group;
    quotas round as floor(budget·share + 0.5) independently per group
    (Σ quotas may differ from budget by rounding — by design), and a
    group can never exceed its own size.  WITHIN each group the kept
    rows are chosen by the content-stable md5 draw (salted ``temp|``,
    id tie-break since the draw has 16-bit resolution), so re-runs and
    corpus growth never flip a kept document — the same property as
    ``hash_split``/``domain_mix``.

    Scale shape: one tiny groupBy count (rows = number of groups), one
    1-row total broadcast (the scalar-subquery pattern), quotas
    broadcast back to the corpus, and ONE rank window per group — the
    same single bounded shuffle as :func:`quota_sample`; skewed groups
    cost their quota, not their size, downstream.

    Exactness: α = 0.5 computes weights with ``sqrt`` — IEEE-exact and
    bit-identical across engines, so the DuckDB oracle replays the
    whole operator value-exactly (the driver gate checks it).  Other α
    use ``pow``, whose last-bit rounding is implementation-defined —
    fine for production, excluded from the cross-engine gate (pytest
    covers α ≠ 0.5 determinism Spark-side)."""
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    wt = (
        F.sqrt(F.col("__n").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    )
    w = n.withColumn("__w", wt)
    tot = w.agg(F.sum("__w").alias("__tw"))
    quotas = (
        w.crossJoin(F.broadcast(tot))
        .select(
            F.col(group_col),
            F.floor(
                F.lit(float(budget)) * F.col("__w") / F.col("__tw") + F.lit(0.5)
            ).alias("__quota"),
        )
    )
    draw = md5_draw16(
        F.concat_ws(
            "|", F.lit("temp"), F.col(group_col), F.col(id_col).cast("string")
        )
    )
    rk_w = Window.partitionBy(group_col).orderBy(
        F.col("__draw").asc(), F.col(id_col).asc()
    )
    return (
        df.join(F.broadcast(quotas), group_col)
        .withColumn("__draw", draw)
        .withColumn("__rk", F.row_number().over(rk_w).cast("bigint"))
        .where(F.col("__rk") <= F.col("__quota"))
        .drop("__draw", "__rk", "__quota")
    )


def weighted_reservoir(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Efraimidis–Spirakis A-Res weighted sampling without replacement
    ("Weighted random sampling with a reservoir", IPL 2006): each row
    draws a uniform u and scores ln(u)/w; the k LARGEST scores are the
    sample — inclusion probability proportional to weight, exactly the
    reservoir algorithm's distribution, but expressed as a top-k so it
    distributes: per-partition partial top-k (WindowGroupLimit /
    TakeOrdered shape), no global sort, no sequential reservoir state.

    Content-stable like everything in this module: u derives from the
    engine-portable md5 fingerprint (functions/phash.py) of
    ``"es{salt}|" + id`` — re-runs and repartitionings return the SAME
    sample, and a vanilla-DuckDB oracle replays the draws exactly; vary
    ``salt`` to draw independent samples.  u is the fingerprint's
    top 53 bits shifted into (0, 1) with a half-ulp offset so u is never
    0 or 1 (ln stays finite).  Rows with NULL, NaN, or non-positive
    weight are excluded (a zero-weight row must never be sampled; A-Res
    is defined for finite w > 0 — and Spark orders NaN above every
    number, so an unfiltered NaN weight would both pass ``> 0`` and
    rank first).  Scores tie only when ids collide (duplicate id rows,
    or two ids sharing their hash's top 53 bits); the rank breaks such
    ties on ``id_col`` so the sample stays deterministic and
    oracle-parity holds even then.
    """
    from maple_spark.functions import phash

    h = phash.fp60(F.concat(F.lit(f"es{salt}|"), F.col(id_col).cast("string")))
    u = (F.shiftright(h, 7).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 53)
    )
    score = F.log(u) / F.col(weight_col).cast("double")
    w = Window.orderBy(F.col("__score").desc(), F.col(id_col).asc())
    wcol = F.col(weight_col).cast("double")
    return (
        df.where(wcol.isNotNull() & ~F.isnan(wcol) & (wcol > 0))
        .withColumn("__score", score)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__score", "__rk")
    )


def dsir_importance(
    docs: DataFrame,
    target_pred,
    n_buckets: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
    k: int | None = None,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): pick raw-pool documents that *look like* a small
    target corpus by (1) featurizing every document as HASHED
    unigram+bigram bucket counts, (2) fitting add-one-smoothed bucket
    distributions p (target) and q (pool), (3) weighting each pool doc
    log w(x) = Σ_b c_b(x)·(ln p_b − ln q_b), and (4) Gumbel-top-k
    resampling ∝ w without replacement.  The reference engine has no
    counterpart (its grammar stops at SQL); this is the
    pretraining-data-selection operator the LM-quality family
    (t19..t23) feeds.

    ``target_pred`` is a boolean Column splitting docs into the target
    corpus (True) and the raw pool (False); only pool docs are scored.

    Scale shape — and WHY hashing is the point: the corpus tokenizes
    and explodes ONCE (``textstats.lm_positions`` — the LM tiers'
    tokenizer, so the gram rules cannot drift), each position emitting
    its unigram + the space-joined bigram ending there; counts
    aggregate map-side into the eagerly-checkpointed (doc, bucket, c)
    table that feeds BOTH distribution fits and the scoring join.
    Unlike a Heaps-law vocabulary (t19's un-hintable join), the hashed
    feature space is FIXED at ``n_buckets`` rows no matter the corpus
    size — the λ model table is ≤ n_buckets rows by construction, so
    its force-broadcast can never hit the 8 GB wall at 100 TB; that
    boundedness is exactly DSIR's design point.  The per-doc score is
    one map-side-combined groupBy on the id; the Gumbel top-k is a
    TakeOrdered (no global sort materialization).

    Cross-engine exactness (the t19 discipline): λ_b is a difference
    of lns of integer counts; each c·λ product casts to
    DECIMAL(38,12) before the order-independent sum; the Gumbel noise
    g = −ln(−ln(u)) draws u from the content-stable 16-bit md5 draw
    (seed ``dsir g{salt}|id``, (draw+0.5)/65536 so u is never 0/1) and
    joins the key in DECIMAL(38,12) too, so selection order is
    deterministic and a vanilla-DuckDB oracle replays build, weights,
    and the selected set value-exactly.  Empty/NULL-text pool docs
    have no features and are excluded (not resampled) by contract.

    Returns (id, n_grams, slc DECIMAL, key DECIMAL) for the pool —
    top-k rows when ``k`` is given; callers round for display.
    """
    from maple_spark.pipelines import textstats

    B = int(n_buckets)
    # pack (id, is_target) into ONE struct so both ride the explode and
    # the counts groupBy without a join back to the docs table
    tagged = docs.select(
        F.struct(
            F.col(id_col).alias("__id"), target_pred.alias("__is_t")
        ).alias("__row"),
        F.col(text_col),
    )
    pos = textstats.lm_positions(tagged, [("prev", 1)], "__row", text_col)
    # one pass over positions: each row emits its unigram and (when a
    # previous token exists) the space-joined bigram — concat() is NULL
    # on the first position and the filter drops it
    grams = (
        pos.select(
            "__row",
            F.explode(
                F.array(
                    F.col("cur"),
                    F.concat(F.col("prev"), F.lit(" "), F.col("cur")),
                )
            ).alias("gram"),
        )
        .where(F.col("gram").isNotNull())
    )
    bucket = md5_draw16(F.concat(F.lit("dsir|"), F.col("gram"))) % B
    c = (
        grams.select("__row", bucket.alias("b"))
        .groupBy("__row", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    # ONE pass fits BOTH distributions: per-bucket target/pool sums in
    # a single b-shuffle (a doc with a NULL predicate contributes to
    # neither side, matching its exclusion from scoring), totals in one
    # 1-row agg over the ≤ n_buckets rows
    mc = c.groupBy("b").agg(
        F.sum(
            F.when(F.col("__row.__is_t"), F.col("c")).otherwise(F.lit(0))
        ).alias("t_cnt"),
        F.sum(
            F.when(~F.col("__row.__is_t"), F.col("c")).otherwise(F.lit(0))
        ).alias("r_cnt"),
    )
    tots = mc.agg(
        F.coalesce(F.sum("t_cnt"), F.lit(0)).alias("tot_t"),
        F.coalesce(F.sum("r_cnt"), F.lit(0)).alias("tot_r"),
    )
    lam = (
        F.log((F.col("t_cnt") + 1).cast("double"))
        - F.log((F.col("tot_t") + B).cast("double"))
        - F.log((F.col("r_cnt") + 1).cast("double"))
        + F.log((F.col("tot_r") + B).cast("double"))
    )
    # pool-observed buckets only (a target-only bucket can never join a
    # pool doc); <= n_buckets rows BY CONSTRUCTION -> the one join in
    # this module where force-broadcast is provably safe at any scale
    model = (
        mc.where(F.col("r_cnt") > 0)
        .crossJoin(F.broadcast(tots))
        .select("b", lam.alias("lam"))
    )
    u = (
        md5_draw16(
            F.concat(F.lit(f"dsirg{salt}|"), F.col("__row.__id").cast("string"))
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(65536.0)
    scored = (
        c.where(~F.col("__row.__is_t"))
        .join(F.broadcast(model), "b")
        .groupBy(F.col("__row"))
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(
                (F.col("c").cast("double") * F.col("lam")).cast("decimal(38,12)")
            ).alias("slc"),
        )
        .select(
            F.col("__row.__id").alias(id_col),
            "n_grams",
            "slc",
            (
                F.col("slc")
                + (-F.log(-F.log(u))).cast("decimal(38,12)")
            ).alias("key"),
        )
    )
    if k is not None:
        scored = scored.orderBy(F.col("key").desc(), F.col(id_col).asc()).limit(k)
    return scored
