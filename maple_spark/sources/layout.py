"""Multi-dimensional data layout — Z-order clustering.

The reference's secondary B+tree indexes (``storage/btreeindex/*``) give
selective access on a non-primary column.  The Parquet-native equivalent is
*layout*: sort the data so file/row-group min-max stats become selective.
A single-column sort only helps that column; Z-ORDER interleaves the bits
of several columns so each output file covers a compact hyper-rectangle —
min/max pruning then works on EVERY z-ordered column at once.

``z_value`` is pure Catalyst bit arithmetic (shiftright/bitwiseAND/
shiftleft sums — JVM, codegen-able, no UDF).  Columns are rank-normalized
to ``bits``-bit integers with *approx-quantile cut points* so skewed/
arbitrary domains interleave evenly: one map-side-combine
``approx_percentile`` pass computes the cut points for ALL columns, the
cuts broadcast as literals, and each row finds its bucket through a
binary-search ``CASE WHEN`` tree — O(log buckets) comparisons, map-only.

The previous formulation ran ``ntile() OVER (ORDER BY col)`` per column:
N single-partition passes over the whole table at ingest (one executor
sorting the world, N times).  Quantile binning costs one aggregate pass
total and keeps every stage parallel; exact-equal-frequency buckets are
not needed — bucketing only has to be monotone, and Delta's OPTIMIZE
ZORDER makes the same approximation with range partition ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (already-normalized) int
    column into one Z-order key.  With 2 columns and 16 bits → 32-bit key."""
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def search_sorted_expr(col: Column, cuts: list) -> Column:
    """Bucket index = number of ``cuts`` <= ``col`` (NULL → 0), as a
    binary-search ``CASE WHEN`` tree over literal cut points: evaluation
    touches O(log len(cuts)) comparisons per row (CASE WHEN branches are
    lazy), stays entirely JVM-side, and needs no join or window.
    ``cuts`` must be sorted and deduplicated."""

    def tree(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        # col >= cuts[mid-1] → bucket in [mid, hi]; NULL comparisons are
        # never true, so NULLs fall through every otherwise() to bucket 0
        # (the reference's NULLS-FIRST placement).
        return F.when(col >= F.lit(cuts[mid - 1]), tree(mid, hi)).otherwise(
            tree(lo, mid - 1)
        )

    return tree(0, len(cuts))


def quantile_cuts(
    df: DataFrame, cols: list[str], n_buckets: int, accuracy: int = 10000
) -> dict[str, list]:
    """Per-column cut points for quantile bucketing.  Returns
    sorted+deduped cuts (≤ n_buckets-1 each); heavy duplicate values
    collapse cuts, which merely widens that value's bucket —
    monotonicity, the only property bucketing needs, holds.

    Numeric columns: ALL in one map-side-combine ``approx_percentile``
    aggregate pass (bounded memory, no driver collect).  Non-numeric
    orderable columns (string/date/timestamp — ``percentile_approx``
    rejects them, but Z-ordering on them is legitimate; Delta's OPTIMIZE
    ZORDER supports them too): one shared seeded-sample pass, evenly
    spaced cut values from the sorted sample — the same
    sample-the-column strategy Spark's own RangePartitioner uses, and
    like it, fully parallel (no single-partition stage)."""
    numeric = {
        "byte", "short", "int", "bigint", "float", "double", "tinyint",
        "smallint", "integer", "long",
    }

    def is_numeric(c):
        t = df.schema[c].dataType.simpleString()
        return t in numeric or t.startswith("decimal")

    num_cols = [c for c in cols if is_numeric(c)]
    other_cols = [c for c in cols if not is_numeric(c)]
    cuts: dict[str, list] = {}
    if num_cols:
        fracs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
        row = df.select(
            *[
                F.percentile_approx(F.col(c), fracs, accuracy).alias(c)
                for c in num_cols
            ]
        ).first()
        cuts.update({c: sorted(set(row[c] or [])) for c in num_cols})
    if other_cols:
        n = df.count()
        target = max(10_000, 20 * n_buckets)
        frac = min(1.0, target / max(n, 1))
        sample = df.select(*other_cols).sample(frac, seed=42).collect()
        for c in other_cols:
            vals = sorted(r[c] for r in sample if r[c] is not None)
            k = len(vals)
            cuts[c] = sorted(
                {
                    vals[(k * i) // n_buckets]
                    for i in range(1, n_buckets)
                    if (k * i) // n_buckets < k
                }
            )
    return cuts


def zorder_write(
    df: DataFrame,
    out_path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 10,
) -> DataFrame:
    """Write ``df`` Z-ordered on ``cols``: quantile-normalize each column to
    ≤ 2^bits buckets, compute the interleaved key, range-partition + sort by
    it, write.  Every output file then covers a compact region in ALL
    ``cols`` → min/max skipping prunes on any of them.  No global window
    anywhere: one aggregate pass for cut points, then map-only bucketing."""
    cuts = quantile_cuts(df, cols, 1 << bits)
    keyed = df.withColumn(
        "__z",
        z_value([search_sorted_expr(F.col(c), cuts[c]) for c in cols], bits),
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    spark = df.sparkSession
    return spark.read.parquet(out_path)
