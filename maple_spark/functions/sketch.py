"""Mergeable sketches expressed in DataFrame algebra.

The HLL surface binds Spark's DataSketches functions (`hll_sketch_agg` /
`hll_union_agg`, used by a11).  Count-Min has no PySpark binding, so it
is built here from first principles as a dataflow — which is also the
honest 100 TB story: the sketch IS a (depth × width) counter table, i.e.
a tiny DataFrame, and building it is one explode + one groupBy with
map-side partials.  Partial sketches from different partitions/days
merge by summing counters — the property that makes sketches the answer
to frequency questions over unbounded streams (Cormode & Muthukrishnan,
"An Improved Data Stream Summary: The Count-Min Sketch and its
Applications", J. Algorithms 2005).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def countmin_table(
    df: DataFrame, col: str, depth: int = 5, width: int = 4096
) -> DataFrame:
    """Build the CMS counter table for ``col``: one row per non-empty
    (hash_fn, bucket) cell.  depth hash functions = xxhash64 salted by
    row index; width buckets per row.  Size ≤ depth × width regardless
    of input cardinality; counters from separate builds merge by
    summing (tested)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("h"),
                F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.h").alias("h"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def countmin_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 5, width: int = 4096
) -> DataFrame:
    """Point-frequency estimates for every row of ``keys``:
    estimate(x) = min over hash functions of counter[h, bucket_h(x)].
    Guarantees: estimate ≥ true count always; ≤ true + εN with
    probability 1−δ where ε ≈ e/width, δ ≈ exp(−depth).  The keys side
    explodes to depth probes and joins the (tiny) sketch — broadcast."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("h"),
                        F.pmod(
                            F.xxhash64(F.lit(i), F.col(key_col)), F.lit(width)
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.h").alias("h"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), on=["h", "bucket"], how="left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("cms_estimate"))
    )


def merge_countmin(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS counter tables built with the same (depth, width):
    cell-wise counter sum — the mergeability property."""
    return (
        a.unionByName(b)
        .groupBy("h", "bucket")
        .agg(F.sum("n").alias("n"))
    )
