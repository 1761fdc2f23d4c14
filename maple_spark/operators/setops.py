"""Set operations — SURVEY.md §2.7.

UNION / INTERSECT / EXCEPT exist only commented-out in the reference grammar
(``nanosql.g:516-518``); provided here as extensions with ANSI bag/set
semantics.  All are single Spark operators: UNION ALL is a zero-shuffle
concatenation; the set variants hash-aggregate on all columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL by column *name* (resolves independent projection orders)."""
    return a.unionByName(b)


def union(a: DataFrame, b: DataFrame) -> DataFrame:
    """ANSI UNION (dedup)."""
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.intersectAll(b) if all else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.exceptAll(b) if all else a.subtract(b)
