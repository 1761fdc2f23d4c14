"""Multi-dimensional data layout — Z-order clustering.

The reference's secondary B+tree indexes (``storage/btreeindex/*``) give
selective access on a non-primary column.  The Parquet-native equivalent is
*layout*: sort the data so file/row-group min-max stats become selective.
A single-column sort only helps that column; Z-ORDER interleaves the bits
of several columns so each output file covers a compact hyper-rectangle —
min/max pruning then works on EVERY z-ordered column at once.

``z_value`` is pure Catalyst bit arithmetic (shiftright/bitwiseAND/
shiftleft sums — JVM, codegen-able, no UDF).  Columns are first rank-
normalized to ``bits``-bit integers with ``ntile`` so skewed/arbitrary
domains interleave evenly (the standard practice — Delta OPTIMIZE ZORDER
does the same with range partition ids).

Scale: the ranking pass is one window over a sample-ranged sort — at
ingest time, amortized over every future pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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


def zorder_write(
    df: DataFrame,
    out_path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 10,
) -> DataFrame:
    """Write ``df`` Z-ordered on ``cols``: rank-normalize each column to
    2^bits buckets, compute the interleaved key, range-partition + sort by
    it, write.  Every output file then covers a compact region in ALL
    ``cols`` → min/max skipping prunes on any of them."""
    norm = df
    for c in cols:
        norm = norm.withColumn(
            f"__r_{c}", F.ntile(1 << bits).over(Window.orderBy(c)) - 1
        )
    keyed = norm.withColumn(
        "__z", z_value([F.col(f"__r_{c}") for c in cols], bits)
    ).drop(*[f"__r_{c}" for c in cols])
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    spark = df.sparkSession
    return spark.read.parquet(out_path)
