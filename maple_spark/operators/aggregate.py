"""Grouping & aggregation — SURVEY.md §2.4 (A1-A9).

Reference status: the hash group-aggregate node is a STUB
(``plans/HashedGroupAggregateNode.java:117-121`` returns null) and the
aggregate function classes (COUNT/MIN/MAX/SUM/AVG,
``functions/{Count,MinMax,SumAvg}Aggregate.java``) are never registered —
so this module implements the reference's *declared* semantics, which its
classes document:

- COUNT(expr) ignores NULLs (``CountAggregate.java:68-70``);
  COUNT(*) counts rows; COUNT(DISTINCT e) via HashSet.
- SUM/AVG skip NULLs (``SumAvgAggregate.java:33-35``); all-NULL group → NULL.
- MIN/MAX Comparable-based, NULLs skipped.

These match Spark (and ANSI) built-in semantics exactly, so every aggregate
is a JVM-side builtin with automatic partial (map-side) + final aggregation
— the two-phase plan the reference never got to.

Numeric determinism vs the oracle: summing DOUBLE is order-dependent, and
Spark's partial aggregation order differs run-to-run and engine-to-engine.
``decimal_sum``/``decimal_avg`` below cast to DECIMAL first so the sum is
exact and bit-identical in Spark and DuckDB — use them in any query that is
hash-compared.  (At 100 TB this is also the *correct* choice for money
columns; TPC-H itself specifies DECIMAL(15,2).)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_aggregate(
    df: DataFrame,
    group_cols: list[str | Column],
    aggs: list[Column],
    having: Column | None = None,
) -> DataFrame:
    """GroupAggregateNode/HashedGroupAggregateNode equivalent
    (+ HAVING, grammar nanosql.g:507-510).  HAVING is a filter over the
    aggregated result — Catalyst evaluates it post-agg, and any part of it
    referencing only group keys is pushed below the aggregate."""
    out = df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
    if having is not None:
        out = out.filter(having)
    return out


def decimal_sum(
    col: str | Column, alias: str, scale: int = 6, precision: int = 18
) -> Column:
    """Exact SUM over a double column: cast each value to
    DECIMAL(precision, scale) then sum; Spark widens the accumulator
    (+10 digits) so a 100 TB-scale row count still can't overflow.
    Returned as double; bit-identical to the DuckDB oracle because both
    sums are exact.

    The default precision 18 is the compact long-backed representation
    (measurably faster than Int128) and bounds each VALUE to
    |v| < 10^(18-scale) — ample for money columns (TPC-H declares
    DECIMAL(15,2)).  Under ANSI mode a wider value fails the cast
    loudly; pass ``precision=38`` for unbounded-domain doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double").alias(alias)
    )


def decimal_avg(
    col: str | Column, alias: str, scale: int = 6, precision: int = 18
) -> Column:
    """Exact-numerator AVG: decimal sum divided by non-null count, in double.
    Deterministic across engines because both operands are exact.  Same
    per-value domain bound as :func:`decimal_sum`."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def distinct(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """SELECT DISTINCT (parsed but never executed in the reference, A8 —
    no planner consumes ``SelectClause.isDistinct``).  Spark plans this as
    a hash aggregate on all columns with partial dedup before the shuffle."""
    return df.dropDuplicates(subset) if subset else df.distinct()


def approx_count_distinct(df: DataFrame, col: str, rsd: float = 0.01) -> Column:
    """Scale path for COUNT(DISTINCT): HyperLogLog++ sketch, one pass, no
    per-group HashSet (the reference's ``CountAggregate.java:15`` keeps a
    HashSet per group — O(distinct) memory, impossible at 100 TB)."""
    return F.approx_count_distinct(col, rsd)
