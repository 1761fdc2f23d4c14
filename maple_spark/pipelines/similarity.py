"""Similarity search over the ``embeddings`` table (array<float> column).

Two tiers:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Dot products run JVM-side via ``aggregate(zip_with(...))`` in double
  precision with a deterministic left-to-right fold (bit-stable across
  engines and partitionings).
- ``lsh_topk``: the scale path — sign-random-projection (SRP) LSH buckets
  shrink the candidate set before exact re-ranking.  Hyperplanes are derived
  deterministically from xxhash64 so results are reproducible run-to-run.

Scale story: brute force is O(n_queries × n_corpus × dim) — fine when the
query side is small enough to broadcast (the common batch-scoring shape:
queries ≪ corpus, corpus never shuffles).  For corpus×corpus or huge query
sets, SRP-LSH (or an IVF coarse quantizer) bounds candidates per query;
both re-rank exactly, so recall degrades gracefully and precision stays 1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Deterministic double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(
    pairs: DataFrame, a_col: str = "qvec", b_col: str = "embedding"
) -> DataFrame:
    """Add ``cosine`` between two array<float> columns."""
    return pairs.withColumn(
        "cosine", _dot(F.col(a_col), F.col(b_col)) / (_norm(F.col(a_col)) * _norm(F.col(b_col)))
    )


def _score_and_rerank(cand: DataFrame, k: int) -> DataFrame:
    """Shared exact-rerank tail for every top-k searcher (sim1/sim3/sim4):
    score (query_id, qvec, neighbor_id, embedding) candidate rows with
    exact cosine, keep each query's top-k (ties on neighbor id for full
    determinism; the rank filter plans as a partial top-k before the
    shuffle).  Self-matches excluded.  Output: (query_id, neighbor_id,
    cosine_r) — rounded to 6 for cross-engine hash stability.  One
    definition so a tie-break or rounding change can't drift between the
    search paths."""
    from pyspark.sql.window import Window

    scored = cand.where(F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cosine",
        _dot(F.col("qvec"), F.col("embedding"))
        / (_norm(F.col("qvec")) * _norm(F.col("embedding"))),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cosine"), 6).alias("cosine_r"),
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector: ``queries``
    broadcast (small side), the corpus scanned once and scored map-side,
    then the shared exact rerank (see :func:`_score_and_rerank`)."""
    from maple_spark.pipelines.util import spread

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("embedding")
        )
    )
    return _score_and_rerank(F.broadcast(q).crossJoin(c), k)


def quantize_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Scalar (symmetric max-abs) int8 quantization of an embedding
    column: per vector, scale s = max(|x_i|) and q_i = floor(x_i·127/s
    + 0.5) ∈ [-127, 127] — the standard 4×-compression trick for
    corpus-scale vector search.  Output: (id, qvec, qnorm) where qvec
    holds the integer levels and qnorm = sqrt(Σ q_i²).

    Exactness contract (what makes this ORACLE-CHECKABLE): every level
    is an integer with |q| ≤ 127, so dot products and norms over qvec
    are EXACT integer arithmetic in doubles (< 2^53) — summation-order
    independent, bit-identical across Spark and DuckDB.  Cosine over
    quantized vectors needs no scale factors at all (they cancel in the
    ratio).  The levels are carried as integer-valued doubles to keep
    the arithmetic identical on both engines; a PERSISTED quantized
    corpus casts them to ``array<tinyint>`` (plus one float scale per
    row if reconstruction is needed) — 4× less scan and shuffle than
    float32, which is the point at 100 TB.  Zero/degenerate vectors
    (s = 0) quantize to all-zero levels."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    s = F.array_max(F.transform(v, F.abs))
    # the rounding is DEFINED as floor(t + 0.5) — one spelling shared
    # verbatim with the DuckDB oracle, no banker's-rounding ambiguity;
    # F.floor returns LONG, recast to double so downstream folds stay
    # one numeric type on both engines
    qv = F.when(
        s.isNull() | (s == 0.0), F.transform(v, lambda x: F.lit(0.0))
    ).otherwise(
        F.transform(
            v,
            lambda x: F.floor(x * F.lit(127.0) / s + F.lit(0.5)).cast("double"),
        )
    )
    out = df.select(F.col(id_col), qv.alias("qvec"))
    return out.withColumn("qnorm", F.sqrt(_dot(F.col("qvec"), F.col("qvec"))))


def build_quantized_snapshot(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus's int8 quantization as parquet — the
    amortized form of :func:`quantized_topk`'s coarse table (the same
    pattern as ``dedup.build_reference_snapshot``): quantize once per
    corpus snapshot, search many query batches against it.  Levels are
    stored as ``array<tinyint>`` (the actual 4× on-disk/scan win; they
    are integers in [-127, 127] by construction) plus the precomputed
    integer norm."""
    quantize_vectors(corpus, id_col, vec_col).select(
        F.col(id_col),
        F.transform(F.col("qvec"), lambda x: x.cast("tinyint")).alias("qvec"),
        F.col("qnorm"),
    ).write.mode("overwrite").parquet(path)


def load_quantized_snapshot(spark, path: str) -> DataFrame:
    """The quantized corpus back in :func:`quantized_topk`'s working
    shape (levels widened back to integer-valued doubles so the exact-
    integer dot arithmetic is identical to the inline path)."""
    df = spark.read.parquet(path)
    return df.select(
        *[c for c in df.columns if c not in ("qvec",)],
        F.transform(F.col("qvec"), lambda x: x.cast("double")).alias("qvec"),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized_snapshot: str | None = None,
) -> DataFrame:
    """Two-stage ANN over scalar-quantized vectors: (1) coarse top-k'
    (k' = k·rerank_mult) per query by EXACT-integer cosine over the
    int8 levels (:func:`quantize_vectors` — scales cancel, so this is
    the true cosine of the quantized vectors), then (2) the shared
    full-precision exact rerank (:func:`_score_and_rerank`) over the
    surviving candidates only.  Same output contract as sim1/sim3/sim4:
    (query_id, neighbor_id, cosine_r).

    Scale story: the coarse pass scans the QUANTIZED corpus — 4× fewer
    bytes than float32; ``quantized_snapshot`` makes that concrete:
    pass a path written by :func:`build_quantized_snapshot` and the
    coarse stage reads the persisted ``array<tinyint>`` table instead
    of re-quantizing the float corpus per query batch (the float table
    is then touched only by the candidate-bounded rerank join — the
    dedup-reference-snapshot pattern; equality-tested).  Queries
    broadcast; per-query top-k' plans as a partial top-k before one
    bounded shuffle.  Recall: max-abs int8 keeps cosine ordering to
    ~1e-2, and the k'-deep exact rerank recovers exact top-k whenever
    the true neighbors sit inside the coarse top-k' (pytest measures
    overlap vs brute force on the fixture)."""
    from maple_spark.pipelines.util import spread

    q8 = quantize_vectors(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qq"),
        F.col("qnorm").alias("qn"),
    )
    if quantized_snapshot is not None:
        c8_src = load_quantized_snapshot(
            corpus.sparkSession, quantized_snapshot
        )
        # the rerank join against the float corpus is INNER: a stale
        # snapshot would silently shrink results, so trip on a row-count
        # mismatch when parquet footers make the check free
        _snapshot_rows_guard(corpus, c8_src, "quantized")
    else:
        c8_src = quantize_vectors(corpus, id_col, vec_col)
    c8 = spread(
        c8_src.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("qvec").alias("qc"),
            F.col("qnorm").alias("cn"),
        )
    )
    denom = F.col("qn") * F.col("cn")
    approx = (
        F.broadcast(q8)
        .crossJoin(c8)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "acos",
            F.when(denom == 0.0, F.lit(-2.0)).otherwise(
                _dot(F.col("qq"), F.col("qc")) / denom
            ),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("acos").desc(), F.col("neighbor_id").asc()
    )
    survivors = (
        approx.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k * rerank_mult)
        .select("query_id", "neighbor_id")
    )
    qf = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    cf = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("embedding")
    )
    cand = survivors.join(F.broadcast(qf), "query_id").join(cf, "neighbor_id")
    return _score_and_rerank(cand, k)


def srp_signature(
    df: DataFrame, id_col: str, vec_col: str, num_planes: int = 16
) -> DataFrame:
    """Sign-random-projection signature: bit i = sign(v · h_i) where
    hyperplane h_i components are deterministic pseudo-random ±1 derived
    from xxhash64(plane, dim_index).  ±1 planes avoid shipping any plane
    matrix — the 'random' projection is recomputed JVM-side from hashes."""
    v = F.col(vec_col)
    dims = F.sequence(F.lit(0), F.size(v) - 1)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    dims,
                    lambda x, j: x.cast("double")
                    * F.when(
                        F.xxhash64(F.lit(p), j).bitwiseAND(F.lit(1)) == 1, 1.0
                    ).otherwise(-1.0),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
            > 0,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias(f"bit{p}")
        for p in range(num_planes)
    ]
    packed = df.select(F.col(id_col), F.col(vec_col), *bits)
    sig = F.aggregate(
        F.array(*[
            (F.col(f"bit{p}") * F.lit(1 << p)).cast("bigint")
            for p in range(num_planes)
        ]),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return packed.select(F.col(id_col), F.col(vec_col), sig.alias("srp_sig"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    multi_probe: bool = False,
) -> DataFrame:
    """ANN top-k: candidates = same SRP bucket, then exact cosine re-rank.

    With b planes, buckets split the corpus ~2^b ways; expected candidates
    per query = n/2^b — the knob that turns a 100 TB brute-force scan into
    a bucket-local probe.  Recall < 1 by construction.

    ``multi_probe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's signature (flip each of the b bits): a
    near neighbor that disagrees on exactly one hyperplane — the dominant
    miss mode, since each bit flips independently with probability θ/π —
    is recovered.  Cost: candidates × (b+1) on the QUERY side only; the
    corpus is never re-hashed or replicated, so the multi-probe trade is
    query-side fan-out for recall, the same lever as LSH forests but
    without extra tables (Lv et al., "Multi-Probe LSH", VLDB 2007).
    """
    from maple_spark.pipelines.util import spread

    qs = srp_signature(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "query_id",
        "qvec",
        num_planes,
    )
    if multi_probe:
        probes = F.array(
            F.col("srp_sig"),
            *[
                F.col("srp_sig").bitwiseXOR(F.lit(1 << p)).cast("bigint")
                for p in range(num_planes)
            ],
        )
        # a (query, neighbor) pair matches at most one probe value (the
        # corpus point has a single signature), so no dedup pass is needed
        qs = qs.select(
            "query_id", "qvec", F.explode(probes).alias("srp_sig")
        )
    cs = srp_signature(
        spread(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("embedding"),
            )
        ),
        "neighbor_id",
        "embedding",
        num_planes,
    )
    return _score_and_rerank(F.broadcast(qs).join(cs, on="srp_sig"), k)


def _dlit(x: float) -> str:
    """Exact double literal for a parsed SQL expression: repr() is the
    shortest round-trip decimal and Java's Double.parseDouble is
    correctly rounded, so CAST('<repr>' AS DOUBLE) reproduces the bit —
    and constant-folds at analysis time."""
    return f"CAST('{repr(float(x))}' AS DOUBLE)"


def _cent_array(cents: list[list[float]]) -> Column:
    """Centroid list as a literal array-of-arrays column (broadcast by
    value into the plan — k×d doubles, driver metadata).  Built as ONE
    parsed expression string, not k×d nested F.lit calls: each Column
    call is a py4j round trip, and the 512-literal build was measured
    at seconds of driver time per call site (the dedup sig_cols
    precedent) — sim4's bench wall was 9.4 s construct / 1.3 s execute
    before this change."""
    parts = ", ".join(
        "array(" + ", ".join(_dlit(x) for x in ctr) + ")" for ctr in cents
    )
    return F.expr(f"array({parts})")


def _dist_structs(vec: Column | str, cents: list[list[float]]) -> Column:
    """(squared-L2 distance, cell) struct per centroid.  Left-to-right
    fold so DuckDB's ``list_reduce`` reproduces it bit-exactly; struct
    sort then orders by (dist, cell) — ties go to the lowest cell.
    One parsed expression per call (same py4j-cost rationale as
    :func:`_cent_array`); ``vec`` may be a column name (fast path) or
    any Column expression."""
    vec_sql = vec if isinstance(vec, str) else None
    if vec_sql is None:
        # fall back to the Column-API formulation for non-trivial vec
        # expressions (none of the current call sites need it)
        return F.transform(
            _cent_array(cents),
            lambda ctr, i: F.struct(
                F.aggregate(
                    F.zip_with(
                        vec,
                        ctr,
                        lambda x, y: (x.cast("double") - y)
                        * (x.cast("double") - y),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("dist"),
                i.alias("cell"),
            ),
        )
    # backtick-escape the identifier before splicing it into SQL: a
    # column literally named "a`b" must parse as `a``b`, not break or
    # alter the expression (current call sites pass fixed names — the
    # risk is latent, but the escape is one replace)
    vec_sql = vec_sql.replace("`", "``")
    structs = ", ".join(
        "struct(aggregate(zip_with(`{v}`, array({lits}), "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS dist, "
        "{i} AS cell)".format(
            v=vec_sql, lits=", ".join(_dlit(x) for x in ctr), i=i
        )
        for i, ctr in enumerate(cents)
    )
    return F.expr(f"array({structs})")


#: corpus parquet footprint above which the Lloyd assignment routes to
#: the Arrow kernel (measured crossover, see the router note in
#: :func:`_lloyd_cells`): 16 MiB ≈ 60k × 64-d float vectors, where the
#: two formulations tie on the stats-pass shape; by 52 MB the kernel
#: wins 1.35× end-to-end and 4.3× on the assignment alone.
LLOYD_KERNEL_MIN_BYTES = 16 << 20


def _assign_cells_arrow_udf(cents: list[list[float]]):
    """Arrow-vectorized argmin-cell assignment — the bit-exact twin of
    ``element_at(array_sort(_dist_structs(vec, cents)), 1)["cell"]``.

    Why a Python kernel in this hot path (optimization round 13, guide
    §4.2): the Catalyst formulation evaluates n_cells INTERPRETED
    ``aggregate(zip_with(...))`` folds per row (higher-order functions
    run outside whole-stage codegen), plus an array_sort over the
    (dist, cell) structs — at 100 TB that interpreted (row × centroid ×
    dim) triple product is the quantizer's dominant CPU term.  The
    codegen-unroll variant was measured and REJECTED in round 12 (512-
    term expressions blow up codegen compile time); this is the Arrow
    escape hatch instead, the same pattern as dedup's banding kernel.

    Exactness, term by term (the oracle reproduces the JVM fold, so the
    kernel must too):

    - float→double widening is exact on both sides (``astype`` ==
      ``CAST``); subtraction/multiplication are single IEEE double ops.
    - the left-to-right ``(acc, v) -> acc + v`` fold is reproduced with
      ``np.add.accumulate`` (ufunc accumulate is DEFINED sequential:
      out[i] = out[i-1] + x[i]; a plain ``.sum()`` would use pairwise
      summation — NOT bit-identical).
    - argmin ties break to the LOWEST cell: ``np.argmin`` returns the
      first occurrence, exactly the (dist, cell) struct sort's order.
    - NaN distances sort GREATER than any number in Spark's ordering —
      mirrored by replacing NaN with +inf before the argmin (a NaN in
      the vector NaNs every cell's fold; a NaN centroid component NaNs
      only that cell).
    - NULL / wrong-length vectors: ``zip_with`` pads the shorter side
      with NULL, so EVERY cell's fold is NULL → all structs carry the
      same non-comparable dist and the (dist, cell) tie-break lands on
      cell 0 regardless of NULL ordering.  The kernel assigns 0 to any
      row whose vector is missing or not exactly d wide; NULL *elements*
      arrive as NaN through Arrow and correctly take the all-cells-
      equal → cell-0 path via the ±inf rule.  (Parity on every edge
      class is pinned in tests/test_pipelines.py.)
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(cents, dtype=np.float64)  # (n_cells, d)
    d = C.shape[1]

    @pandas_udf("int")
    def assign_cell(vecs):
        n = len(vecs)
        out = np.zeros(n, dtype=np.int64)
        vals = vecs.to_numpy()
        lens = np.fromiter(
            (len(v) if v is not None else -1 for v in vals),
            dtype=np.int64,
            count=n,
        )
        ok = lens == d
        if ok.any():
            A = np.stack(vals[ok]).astype(np.float64)  # (m, d)
            S = np.empty((A.shape[0], C.shape[0]), dtype=np.float64)
            for j in range(C.shape[0]):
                diff = A - C[j]
                np.multiply(diff, diff, out=diff)
                # sequential prefix sum == the JVM's left-to-right fold
                S[:, j] = np.add.accumulate(diff, axis=1)[:, -1]
            np.copyto(S, np.inf, where=np.isnan(S))
            out[ok] = S.argmin(axis=1)
        return pd.Series(out).astype("int32")

    return assign_cell


def _lloyd_cells(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    lloyd_iters: int = 2,
) -> tuple[DataFrame, list[list[float]]]:
    """Deterministic-Lloyd coarse quantizer shared by :func:`ivf_topk`
    (sim4) and :func:`semdedup` (sim5).  Returns (assignment, centroids):
    assignment has columns (neighbor_id, embedding, cell).

    Fully deterministic — and therefore SQL-oracle-reproducible:
    min-id init, argmin squared-L2 with left-to-right fold and ties to
    the lowest cell, per-cell means summed in DECIMAL(38,12) (exact,
    order-independent), a fixed number of rounds.  Each round is one
    map-only assignment pass plus one (cell, dim)-grouped partial agg;
    centroids are k×d values round-tripped through the driver (the
    standard k-means dataflow)."""
    from maple_spark.pipelines.util import spread

    c = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("embedding")
        )
    )
    centroids = [
        [float(x) for x in r["embedding"]]
        for r in c.orderBy("neighbor_id").limit(n_cells).collect()
    ]

    from maple_spark.pipelines.dedup import _arrow_available
    from maple_spark.pipelines.util import parquet_files_stats

    # Tier router (the fp_set_best / carry_sets discipline): the Arrow
    # kernel wins only once the corpus is big enough to amortize the
    # per-pass Python-worker round trips — measured crossover on the
    # stats-pass shape (SIM_KERNEL_AB_r13.json probes, local[32]):
    # 0.8 MB/2k rows expr wins (0.63 vs 0.67 s), 5 MB/20k ~tie, 16 MB/
    # 60k ~tie, 52 MB/200k kernel wins (1.45 vs 1.95 s; assignment
    # alone 0.62 vs 2.68 s — the interpreted (row × cell × dim) folds
    # are the at-scale CPU term, guide §4.2).  Small or UNSTATABLE
    # (in-memory) corpora keep the Catalyst formulation — also the
    # honest-statistics default (no UDF-erased size lineage).
    _stats = parquet_files_stats(corpus)
    use_kernel = (
        _arrow_available()
        and _stats is not None
        and _stats[0] > LLOYD_KERNEL_MIN_BYTES
    )

    def assign(cents):
        # Arrow kernel above the size gate, else the Catalyst
        # struct-sort — ties to the lowest cell either way
        # (value-identical, pytest-pinned)
        if use_kernel:
            return c.withColumn(
                "cell", _assign_cells_arrow_udf(cents)(F.col("embedding"))
            )
        return c.withColumn(
            "cell",
            F.element_at(
                F.array_sort(_dist_structs("embedding", cents)), 1
            )["cell"],
        )

    for _ in range(lloyd_iters):
        stats = (
            assign(centroids)
            .select("cell", F.posexplode(F.col("embedding").cast("array<double>")))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.col("col").cast("decimal(38,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_cents = [list(ctr) for ctr in centroids]  # empty cells keep old
        for r in stats:
            new_cents[r["cell"]][r["pos"]] = float(r["s"]) / r["n"]
        centroids = new_cents

    return assign(centroids).select("neighbor_id", "embedding", "cell"), centroids


def build_ivf_snapshot(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    lloyd_iters: int = 2,
) -> None:
    """Persist the trained IVF index — cell assignments + centroids —
    as parquet (the FAISS train/add split, and the same amortization
    pattern as the dedup/quantized snapshots): the Lloyd rounds run
    ONCE per corpus snapshot, and every query batch afterwards pays
    only centroid probing + the in-cell rerank.  Layout:
    ``{path}/assignment.parquet`` (neighbor_id, embedding, cell) and
    ``{path}/centroids.parquet`` (cell, centroid) — the centroid table
    is k×d values, driver metadata by construction."""
    assigned, centroids = _lloyd_cells(
        corpus, id_col, vec_col, n_cells, lloyd_iters=lloyd_iters
    )
    assigned.write.mode("overwrite").parquet(f"{path}/assignment.parquet")
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(i, ctr) for i, ctr in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    # pin the training params the way dedup.build_reference_snapshot
    # pins (num_perm, bands, k): probing with a different n_cells than
    # the snapshot was trained with silently probes the wrong geometry
    spark.createDataFrame(
        [(n_cells, lloyd_iters)], "n_cells int, lloyd_iters int"
    ).write.mode("overwrite").parquet(f"{path}/meta.parquet")


def load_ivf_snapshot(
    spark, path: str, n_cells: int = 16, lloyd_iters: int | None = 2
) -> tuple[DataFrame, list[list[float]]]:
    """(assignment, centroids) back in :func:`ivf_topk`'s working shape;
    centroids come back in cell order so probe indices line up with the
    assignment's cell ids.  Raises if the snapshot was trained with
    different (n_cells, lloyd_iters) than the caller is probing with;
    ``lloyd_iters=None`` skips that half of the check — probe-time
    callers (:func:`ivf_topk`) don't care how many rounds trained the
    centroids, only that the cell geometry (n_cells) matches."""
    from pyspark.errors import AnalysisException

    # narrow catch (review finding, round 10): ONLY the missing-path /
    # not-a-parquet-table analysis error maps to "rebuild the snapshot";
    # IO blips, permission failures, or corrupt files must surface
    # as themselves, not as advice to destroy a valid snapshot
    try:
        rows = spark.read.parquet(f"{path}/meta.parquet").collect()
    except AnalysisException as exc:
        raise ValueError(
            f"IVF snapshot {path} has no readable meta.parquet — it "
            "predates training-param pinning (or is not an IVF snapshot); "
            "rebuild it with build_ivf_snapshot"
        ) from exc
    if not rows:
        raise ValueError(
            f"IVF snapshot {path} has an EMPTY meta.parquet — the "
            "snapshot write was interrupted; rebuild it with "
            "build_ivf_snapshot"
        )
    meta = rows[0]
    if meta["n_cells"] != n_cells or (
        lloyd_iters is not None and meta["lloyd_iters"] != lloyd_iters
    ):
        got = (meta["n_cells"], meta["lloyd_iters"])
        want = (n_cells, lloyd_iters)
        raise ValueError(
            f"IVF snapshot {path} was trained with "
            f"(n_cells, lloyd_iters)={got}, caller wants {want}"
        )
    assigned = spark.read.parquet(f"{path}/assignment.parquet")
    cents = spark.read.parquet(f"{path}/centroids.parquet").orderBy("cell")
    return assigned, [list(r["centroid"]) for r in cents.collect()]


def _snapshot_rows_guard(corpus: DataFrame, snap: DataFrame, what: str) -> None:
    """Cheap identity tripwire between a live corpus and its persisted
    snapshot: when BOTH row counts are knowable from parquet footers
    (metadata only, no scan — pipelines.util.parquet_files_stats), a
    mismatch means the snapshot is stale and the downstream inner joins
    would silently drop results; fail loudly instead.  Unstatable
    inputs (in-memory frames, remote paths) skip the check — the
    docstring contract (rebuild the snapshot when the corpus changes)
    is then the only guard, same as dedup's reference snapshot."""
    from maple_spark.pipelines.util import parquet_files_stats

    cs, ss = parquet_files_stats(corpus), parquet_files_stats(snap)
    if cs and ss and cs[1] is not None and ss[1] is not None and cs[1] != ss[1]:
        raise ValueError(
            f"{what} snapshot holds {ss[1]} rows but the corpus has "
            f"{cs[1]} — stale snapshot; rebuild it from the current corpus"
        )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 2,
    ivf_snapshot: str | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: a k-means coarse quantizer assigns each
    corpus vector to a cell; queries probe their ``n_probe`` nearest
    centroids and re-rank exactly within those cells.

    The quantizer is Lloyd's algorithm in DataFrame algebra, made FULLY
    DETERMINISTIC so the whole operator has an exact SQL oracle twin
    (previously MLlib KMeans — rows-only, its kmeans|| init and
    float-sum centroids are engine-internal):

    - init: the ``n_cells`` corpus vectors with the smallest ids;
    - assignment: argmin squared-L2 against broadcast centroid literals,
      ties to the lowest cell — one map-only pass, the distance fold is
      left-to-right so DuckDB's ``list_reduce`` reproduces it bit-exactly;
    - update: per-cell per-dimension mean with the summation done in
      DECIMAL(38,12) — decimal addition is exact and order-independent,
      so the mean does not depend on partitioning (a double sum would),
      then one double division;
    - ``lloyd_iters`` fixed rounds (no convergence test → no
      data-dependent control flow for the oracle to mirror).

    Scale shape unchanged: each round is one map-only assignment pass +
    one (cell, dim)-grouped partial agg; centroids are k×d values round-
    tripped through the driver (the standard k-means dataflow — MLlib
    does the same); the search join touches ~n_probe/n_cells of the
    corpus per query.  Recall rises with n_probe (= n_cells ⇒ exact).
    ``ivf_snapshot`` (a path written by :func:`build_ivf_snapshot`)
    skips training entirely — the per-query-batch cost drops to probe +
    in-cell rerank, the amortized production shape (equality-tested
    against the inline path).  With a snapshot, the SNAPSHOT is the
    searched corpus: the ``corpus`` argument is consulted only for a
    row-count staleness tripwire — rebuild the snapshot when the
    corpus changes, or new vectors are silently never candidates.
    The loader raises on an (n_cells) mismatch with the snapshot's
    training meta.
    """
    if ivf_snapshot is not None:
        # probe time only needs the cell geometry to match — a snapshot
        # trained with a non-default lloyd_iters is still valid here
        assigned, centroids = load_ivf_snapshot(
            queries.sparkSession, ivf_snapshot, n_cells=n_cells, lloyd_iters=None
        )
        _snapshot_rows_guard(corpus, assigned, "IVF")
    else:
        assigned, centroids = _lloyd_cells(
            corpus, id_col, vec_col, n_cells, lloyd_iters=2
        )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # distance query→each centroid (the SAME dist_structs fold as the
    # assignment path — one definition keeps the oracle bit-parity),
    # take the n_probe nearest cells
    probed = q.select(
        "query_id",
        "qvec",
        F.explode(
            F.slice(F.array_sort(_dist_structs("qvec", centroids)), 1, n_probe)
        ).alias("pc"),
    ).select("query_id", "qvec", F.col("pc.cell").alias("cell"))

    return _score_and_rerank(F.broadcast(probed).join(assigned, on="cell"), k)


def semdedup(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    lloyd_iters: int = 2,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with a cheap coarse quantizer,
    then prune near-duplicates WITHIN each cluster only — the scalable
    middle ground between exact all-pairs (:func:`embedding_near_dup`,
    Θ(n²·d)) and pure ANN recall tiers (sim3/sim4).

    Semantics (deterministic, SQL-expressible): a document is dropped
    when its cell contains a lower-id document with cosine ≥ threshold;
    ``dup_of`` is the smallest such id, NULL for keepers.  This is the
    pairwise shadowing rule, not transitive clustering — for connected-
    component dedup groups see ``dedup_clusters`` (d5).  Output: one row
    per input, (vec_id, cell, keep, dup_of).

    Dataflow: the shared deterministic-Lloyd quantizer
    (:func:`_lloyd_cells` — identical init/assignment/update to sim4, so
    one SQL CTE chain oracles both), then ONE shuffle on cell and a
    per-cell Arrow-batched gram-matrix kernel (A·Aᵀ at BLAS speed, the
    same numpy cosine as :func:`embedding_near_dup` whose threshold
    comparison is oracle-parity-proven by sim2).

    100 TB shape: within-cell work is Θ(Σ c_i²·d) — n_cells scales with
    the corpus to bound cell sizes (the paper runs ~100k clusters), each
    cell is one independent task, and the only data motion is the one
    hash shuffle on cell.  The quantizer itself is map-only passes +
    a (cell, dim) partial agg.  Oversized cells can recurse (re-cluster
    within the cell) without changing the rule's semantics."""
    import numpy as np
    import pandas as pd

    # dup_of carries ids, so its Spark type AND its nullable pandas dtype
    # both follow the id column — a hard-coded Int64 would crash in the
    # kernel for string/int32 ids despite the generic id_col parameter
    id_dtype = df.schema[id_col].dataType.simpleString()
    pd_dtype = {
        "bigint": "Int64",
        "int": "Int32",
        "smallint": "Int16",
        "tinyint": "Int8",
        "string": "string",
    }.get(id_dtype)
    if pd_dtype is None:
        raise TypeError(
            f"semdedup: unsupported id column type {id_dtype!r}"
            " (integral or string ids only)"
        )

    assigned, _ = _lloyd_cells(df, id_col, vec_col, n_cells, lloyd_iters)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        ids = pdf["neighbor_id"].to_numpy()
        A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(A, axis=1)
        G = (A @ A.T) / np.outer(nrm, nrm)
        # strict lower triangle: candidate shadows are lower-id rows only
        hit = np.tril(G >= threshold, -1)
        has = hit.any(axis=1)
        # ids ascending ⇒ first True column IS the smallest shadowing id
        first = hit.argmax(axis=1)
        dup = pd.array(
            [ids[j] if h else None for h, j in zip(has, first)], dtype=pd_dtype
        )
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"],
                "keep": ~has,
                "dup_of": dup,
            }
        )

    out_schema = (
        f"vec_id {id_dtype}, cell int, keep boolean, dup_of {id_dtype}"
    )
    return assigned.groupBy("cell").applyInPandas(prune, schema=out_schema)


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 1024,
    n_blocks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (corpus × corpus, id_a < id_b,
    cosine ≥ threshold) — EXACT, via a blocked gram-matrix cogroup join.

    Exact all-pairs cosine is inherently Θ(n²·d) in the worst case; the
    scalable APPROXIMATE near-dup path is SRP-LSH (:func:`lsh_topk` /
    ``sim3``).  What an exact operator CAN do at scale is (a) distribute
    the quadratic evenly and (b) drive its constant down to BLAS speed:

    1. Each vector gets a block id ``b = xxhash64(id) mod nb`` where
       ``nb ≈ n / block_rows`` (hash ⇒ balanced blocks, no skew).
    2. The nb·(nb+1)/2 unordered block pairs (bi ≤ bj) form a tiny
       driver-built relation, BROADCAST-joined against the corpus twice
       (once on bi, once on bj) — replication factor is nb per row, the
       standard blocked-GEMM trade, and the only shuffles are the two
       cogroup exchanges on (bi, bj).  No CartesianProduct anywhere
       (plan-shape-tested).
    3. Per block pair, one Arrow-batched ``applyInPandas`` kernel computes
       the full A·Bᵀ gram matrix with numpy (BLAS), scales by the norm
       outer product — the same dot/(‖a‖·‖b‖) formula as the all-pairs
       oracle — and emits only pairs ≥ threshold.  Each unordered pair
       {x, y} lands in exactly one group (sorted block ids), oriented
       id_a < id_b; diagonal groups keep the strict upper triangle.

    Output is identical to the brute-force formulation (equality-tested
    against :func:`embedding_near_dup_allpairs`): recall and precision
    are exactly 1.0 by construction.

    Why not metric-space pivot pruning (grid / epsilon-grid-order)?  In
    high dimension, concentration of measure makes it vacuous: for random
    64-d vectors every pivot angle θ_i = acos(v_i/‖v‖) concentrates in
    π/2 ± 1/√d, so at t = 0.4 the bucket width acos(0.4) ≈ 1.16 rad
    covers the entire occupied range (~3 buckets/axis, candidate ratio
    ≈ 1) and the "pruned" join degenerates to all pairs evaluated one
    row at a time through interpreted higher-order functions — measured
    33.8 s vs < 1 s for this kernel on the same 2 000 × 64 input.  Block
    work is (block_rows²·d) FLOPs and 2·block_rows·d·8 bytes per task —
    ``block_rows`` tunes task memory at any scale.

    Scale shape: FLOPs n²d/2 spread over nb²/2 independent tasks, each
    running at matmul speed; shuffle volume n·nb·d·8 bytes.  nb is sized
    from the input's parquet footprint (metadata only via ``inputFiles``
    — no job runs at build time, so bench timings include every scan),
    capped at 1024 blocks: nb² block pairs and n²d/2 FLOPs are the
    exact-tier's honest budget, and past ~1024·block_rows vectors the
    right tool is the approximate tier (sim3 SRP-LSH), not a bigger
    exact join.  Pass ``n_blocks`` to override.
    """
    import math
    import os

    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    if n_blocks is None:
        # ~1024 embedding rows ≈ 0.5 MiB of compressed parquet at d=64
        try:
            nbytes = 0
            for f in df.inputFiles():
                path = f[len("file:"):] if f.startswith("file:") else f
                nbytes += os.path.getsize(path)
        except Exception:
            nbytes = 0
        if nbytes:
            n_blocks = max(1, math.ceil(nbytes / (512 * 1024)))
        else:
            # non-file source (in-memory frame): fall back to a count
            n_blocks = max(1, math.ceil(df.count() / block_rows))
        n_blocks = min(n_blocks, 1024)
    corpus = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("b"),
    )
    id_type = df.schema[id_col].dataType.simpleString()
    pairs = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    left = (
        F.broadcast(pairs.alias("p1"))
        .join(corpus.alias("c1"), F.col("p1.bi") == F.col("c1.b"))
        .select(
            F.col("p1.bi").alias("bi"),
            F.col("p1.bj").alias("bj"),
            F.col("c1.id").alias("id"),
            F.col("c1.v").alias("v"),
        )
    )
    right = (
        F.broadcast(pairs.alias("p2"))
        .join(corpus.alias("c2"), F.col("p2.bj") == F.col("c2.b"))
        .select(
            F.col("p2.bi").alias("bi"),
            F.col("p2.bj").alias("bj"),
            F.col("c2.id").alias("id"),
            F.col("c2.v").alias("v"),
        )
    )

    def gram(key, lpdf, rpdf):
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        if lpdf.empty or rpdf.empty:
            return empty
        A = np.stack(lpdf["v"].to_numpy())
        B = np.stack(rpdf["v"].to_numpy())
        na = np.linalg.norm(A, axis=1)
        nb_ = np.linalg.norm(B, axis=1)
        G = (A @ B.T) / np.outer(na, nb_)
        ia, ib = np.nonzero(G >= threshold)
        if ia.size == 0:
            return empty
        idl = lpdf["id"].to_numpy()[ia]
        idr = rpdf["id"].to_numpy()[ib]
        if key[0] == key[1]:
            keep = idl < idr  # strict upper triangle: each pair once
            idl, idr, ia, ib = idl[keep], idr[keep], ia[keep], ib[keep]
        out_a = np.minimum(idl, idr)
        out_b = np.maximum(idl, idr)
        return pd.DataFrame(
            {"id_a": out_a, "id_b": out_b, "cosine": G[ia, ib]}
        )

    hits = (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(gram, schema=f"id_a {id_type}, id_b {id_type}, cosine double")
    )
    # round in Spark (HALF_UP), matching the all-pairs oracle's rounding
    return hits.select("id_a", "id_b", F.round("cosine", 6).alias("cosine_r"))


def embedding_near_dup_allpairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force all-pairs formulation — the pytest oracle for
    :func:`embedding_near_dup` (output-identical; quadratic crossJoin, so
    never the shipped default)."""
    from maple_spark.pipelines.util import spread

    a = spread(df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine_r"))
    )
