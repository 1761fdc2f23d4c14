"""Sort / order-by — SURVEY.md §2.6 (O1-O3).

Reference: ``plans/SortNode.java:135-151`` materializes every child tuple in
an ArrayList and calls ``Collections.sort`` — in-memory, no spill.  Spark's
``orderBy`` is a distributed sort: range-partition on a sampled key
distribution, per-partition external (spilling) sort — the same operator
made scale-safe for free.

Null ordering: the reference's ``TupleComparator.java:104-113`` sorts NULL
before non-NULL, i.e. NULLS FIRST under ASC and NULLS LAST under DESC.
That happens to be Spark's default, but we spell it explicitly so the
semantics survive any default change, and oracle SQL must spell
``NULLS FIRST``/``NULLS LAST`` because DuckDB defaults to NULLS LAST.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sort_key(col: str | Column, ascending: bool = True) -> Column:
    """One ORDER BY key with the reference's null placement
    (``expressions/OrderByExpression.java`` + TupleComparator semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.asc_nulls_first() if ascending else c.desc_nulls_last()


def order_by(df: DataFrame, *keys: tuple[str | Column, bool] | str | Column) -> DataFrame:
    """SortNode equivalent.  ``keys`` are columns (default ASC) or
    ``(column, ascending)`` pairs."""
    cols = []
    for k in keys:
        if isinstance(k, tuple):
            cols.append(sort_key(k[0], k[1]))
        else:
            cols.append(sort_key(k))
    return df.orderBy(*cols)


def top_k(df: DataFrame, k: int, *keys: tuple[str | Column, bool] | str | Column) -> DataFrame:
    """LIMIT-after-sort (absent from the reference grammar, O3 — provided as
    an extension).  Spark plans this as TakeOrderedAndProject: each partition
    keeps only its local top-k, the driver merges — no global sort, no full
    shuffle.  The scale-correct way to do top-k on 100 TB."""
    return order_by(df, *keys).limit(k)


def distributed_row_number(
    df: DataFrame,
    bucket_col: str | Column,
    order_keys: list[Column],
    rn_name: str = "rn",
    n_buckets: int | None = None,
) -> DataFrame:
    """Global ``row_number()`` without a single-partition window.

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY plans as
    ``Exchange SinglePartition → Window``: the whole relation flows through
    ONE task.  Fine for the reference's in-memory SortNode
    (``plans/SortNode.java:135-151`` materializes everything anyway), fatal
    at 100 TB.  This is the distributed two-pass rank:

    1. ``approx_percentile`` cut points of the leading sort key
       (``bucket_col``) — one map-side-combine pass, O(n_buckets) driver
       metadata.  Bucketing only has to be MONOTONE in the sort key for the
       rank to be exact; cut-point precision affects balance, not
       correctness, so approximate quantiles are safe.
    2. Rows map to buckets with a pure-Catalyst comparison ladder (NULLs →
       bucket 0: the reference sorts NULLS FIRST under ASC,
       ``TupleComparator.java:104-113``).
    3. Per-bucket counts → cumulative offsets via a window over the
       *metadata-sized* counts table (same stitch pattern as
       ``sources/ingest.py:analyze_encoding``) → broadcast back.
    4. ``rn = offset + row_number() OVER (PARTITION BY bucket ORDER BY …)``
       — every partition ranks in parallel.

    The result is exact and deterministic whenever ``order_keys`` is a
    total order (ties would be rank-assigned per bucket-local order).
    ``bucket_col`` must be numeric/orderable by ``approx_percentile`` and
    must be the leading ``order_keys`` expression.
    """
    from maple_spark.sources.layout import search_sorted_expr

    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bc = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(
        F.percentile_approx(bc, F.array(*[F.lit(f) for f in fracs]), 10000).alias(
            "cuts"
        )
    ).first()
    cuts = sorted(set(row["cuts"] or []))  # all-NULL key → no cuts → 1 bucket
    # same binary-search CASE tree as Z-order binning: O(log n_buckets)
    # lazy branches per row, NULLs fall through to bucket 0 (NULLS FIRST)
    bucketed = df.withColumn("__bkt", search_sorted_expr(bc, cuts))

    from pyspark.sql.window import Window

    counts = bucketed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt"))
    w_meta = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__bkt", F.coalesce(F.sum("__cnt").over(w_meta), F.lit(0)).alias("__off")
    )
    w_local = Window.partitionBy("__bkt").orderBy(*order_keys)
    return (
        bucketed.join(F.broadcast(offsets), "__bkt")
        .withColumn(rn_name, (F.col("__off") + F.row_number().over(w_local)).cast("bigint"))
        .drop("__bkt", "__off")
    )
