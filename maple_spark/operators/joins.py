"""Join operators — SURVEY.md §2.3 (J1-J8).

Reference: ``plans/NestedLoopsJoinNode.java`` (the planner's only join
algorithm, and PARTIAL — it never null-pads outer joins) and
``plans/SortMergeJoinNode.java`` (equi-join only, never chosen by the
planner).  This module implements the *declared* semantics correctly:
all five ``relations/JoinType.java:5-33`` types plus NATURAL/USING
(``commands/FromClause.java:711-747``) and the semi/anti joins that back
IN/EXISTS subqueries (stubs E8-E10 in the reference).

Spark-first notes:
- ``df.join`` lets Catalyst pick broadcast-hash / shuffled-hash / sort-merge
  / broadcast-nested-loop per equi-ness, sizes, and AQE runtime stats — the
  selection logic the reference's DP planner hardcodes to NLJ.
- ``broadcast=`` hints the small side explicitly.  At 100 TB the dimension
  tables of a star schema must be broadcast or every query shuffles the
  fact table; AQE also auto-converts when the built side is < threshold.
- NATURAL/USING joins use Spark's ``on=[cols]`` form, which deduplicates
  the join columns in the output exactly like the reference's
  ``buildJoinSchema`` (left columns first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: reference JoinType (relations/JoinType.java) → Spark how=
JOIN_TYPES = {
    "INNER": "inner",
    "LEFT_OUTER": "left",
    "RIGHT_OUTER": "right",
    "FULL_OUTER": "full",
    "CROSS": "cross",
    "SEMIJOIN": "left_semi",
    "ANTIJOIN": "left_anti",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: Column | list[str] | None = None,
    how: str = "INNER",
    broadcast: str | None = None,
) -> DataFrame:
    """ThetaJoinNode/NestedLoopsJoinNode equivalent with correct outer-join
    null-padding (the reference accepts a JoinType but only emits matching
    pairs — ``NestedLoopsJoinNode.java:123-155``; we implement the declared
    semantics, not the bug).

    ``broadcast`` ∈ {"left", "right"} forces a broadcast-hash join on that
    side — use for dimension tables so the fact side never shuffles.
    """
    how_spark = JOIN_TYPES.get(how.upper(), how)
    if broadcast == "left":
        left = F.broadcast(left)
    elif broadcast == "right":
        right = F.broadcast(right)
    if how_spark == "cross" and on is None:
        return left.crossJoin(right)
    return left.join(right, on=on, how=how_spark)


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Cartesian product (``FROM a, b`` / CROSS JOIN, grammar nanosql.g:547,565)."""
    return left.crossJoin(right)


def natural_join(left: DataFrame, right: DataFrame, how: str = "INNER") -> DataFrame:
    """NATURAL JOIN: join on every common column name, output deduplicated
    with left columns first (reference ``FromClause.buildJoinSchema:798``)."""
    common = [c for c in left.columns if c in set(right.columns)]
    if not common:
        # NATURAL <how> JOIN with no common columns degenerates to
        # <how> JOIN ON TRUE — the outer modes must still null-pad
        # (a bare crossJoin would drop `how` and lose unmatched rows)
        return join(left, right, on=F.lit(True), how=how)
    return using_join(left, right, common, how)


def using_join(
    left: DataFrame, right: DataFrame, cols: list[str], how: str = "INNER"
) -> DataFrame:
    """JOIN ... USING (cols): Spark's list-form ``on`` already emits each
    USING column once (coalesced for outer joins), matching the reference's
    merged-schema semantics."""
    return left.join(right, on=cols, how=JOIN_TYPES.get(how.upper(), how))


def semi_join(left: DataFrame, right: DataFrame, on: Column | list[str]) -> DataFrame:
    """LEFT SEMI — the relational op behind ``IN (subquery)`` / ``EXISTS``
    (reference parses but throws: ``expressions/InOperator.java:96-98``,
    ``ExistsOperator.java:46-49``).  Left rows with ≥1 match, left schema
    only, no duplication."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column | list[str]) -> DataFrame:
    """LEFT ANTI — ``NOT IN`` / ``NOT EXISTS`` complement of semi_join.
    NOTE: SQL ``NOT IN`` with NULLs in the subquery result yields *no rows*
    (3VL); callers implementing NOT IN must pre-filter NULLs or use the
    NOT-EXISTS form, which this operator matches."""
    return left.join(right, on=on, how="left_anti")
