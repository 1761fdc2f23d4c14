"""Subquery rewrites — SURVEY.md §2.8 E8-E10.

The reference parses IN (subquery), EXISTS, and scalar subqueries but every
``evaluate()`` throws or returns null (``expressions/InOperator.java:96-98``,
``ExistsOperator.java:46-49``, ``ScalarSubquery.java:36-39``); its
``Environment`` parent-chaining for correlation was never finished
(``expressions/Environment.java:32-59``).  This module implements the
declared semantics as join rewrites — the same decorrelation Catalyst
performs internally for SQL-path subqueries:

- ``IN (subquery)``      → left-semi join on the compared columns
- ``NOT IN (subquery)``  → 3VL-correct anti join (NULL in the subquery
                            result ⇒ empty result, per ANSI)
- ``EXISTS (corr)``      → left-semi join on the correlation condition
- ``NOT EXISTS (corr)``  → left-anti join
- scalar subquery        → broadcast cross-join of the 1-row aggregate

Scale note: semi/anti joins shuffle only distinct keys of the subquery side
(Spark builds the hash side from it); scalar subqueries broadcast a single
row.  Both are cluster-safe shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def in_subquery(left: DataFrame, left_col: str, sub: DataFrame) -> DataFrame:
    """``left WHERE left_col IN (SELECT <only col of sub>)``.
    NULL left values never match (= returns NULL) — semi join drops them,
    matching 3VL."""
    sub_col = sub.columns[0]
    return left.join(
        sub.select(F.col(sub_col).alias("__in_key")).distinct(),
        on=left[left_col] == F.col("__in_key"),
        how="left_semi",
    )


def not_in_subquery(left: DataFrame, left_col: str, sub: DataFrame) -> DataFrame:
    """3VL-correct NOT IN: if the subquery produces any NULL, the predicate
    is never TRUE for any row → empty result.  Implemented by anti-joining
    against non-NULL keys and cross-checking the NULL count — the NULL
    check is a 1-row broadcast, not a driver round-trip per row."""
    sub_col = sub.columns[0]
    keys = sub.select(F.col(sub_col).alias("__in_key"))
    stats = keys.select(
        F.max(F.col("__in_key").isNull().cast("int")).alias("__has_null"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    anti = left.join(
        keys.where(F.col("__in_key").isNotNull()).distinct(),
        on=left[left_col] == F.col("__in_key"),
        how="left_anti",
    )
    # left-NULL rows: NULL NOT IN (non-empty set) is NULL → dropped, but
    # NULL NOT IN (EMPTY set) is TRUE → kept (ANSI; PostgreSQL agrees)
    return (
        anti.crossJoin(F.broadcast(stats))
        .where(F.coalesce(F.col("__has_null"), F.lit(0)) == 0)
        .where(F.col(left_col).isNotNull() | (F.col("__n_keys") == 0))
        .drop("__has_null", "__n_keys")
    )


def exists(left: DataFrame, sub: DataFrame, cond: Column) -> DataFrame:
    """Correlated EXISTS: ``cond`` references columns of both sides."""
    return left.join(sub, on=cond, how="left_semi")


def not_exists(left: DataFrame, sub: DataFrame, cond: Column) -> DataFrame:
    return left.join(sub, on=cond, how="left_anti")


def scalar_subquery(left: DataFrame, sub: DataFrame) -> DataFrame:
    """Uncorrelated scalar subquery: ``sub`` must be a 1-row/1-col aggregate;
    its value becomes a column on every left row via broadcast cross join
    (one row shipped to every executor — no shuffle of ``left``)."""
    return left.crossJoin(F.broadcast(sub))
