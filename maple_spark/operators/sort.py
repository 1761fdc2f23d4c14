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
