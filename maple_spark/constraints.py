"""Constraint metadata + validation — the ``TableSchema`` analog.

Reference: ``relations/TableSchema.java:17`` carries primary/candidate/
foreign keys and NOT NULL flags; the storage engine enforces them on DML
(``commands/ConstraintDecl.java``).  Spark doesn't enforce constraints, so
the engine records them as metadata and validates them with *distributed
checks* — each check is a DataFrame the caller can run at ingest or in CI.

Scale note: every validator is a single aggregate or join — uniqueness is
one hash aggregation on the key, referential integrity one left-anti join
(both partial-agg / broadcast-friendly).  No collect-and-loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TableConstraints:
    """Declared constraints for one table (CREATE TABLE decl analog)."""

    primary_key: list[str] | None = None
    not_null: list[str] = field(default_factory=list)
    unique: list[list[str]] = field(default_factory=list)
    #: (local cols, foreign table name, foreign cols)
    foreign_keys: list[tuple[list[str], str, list[str]]] = field(default_factory=list)


def pk_violations(df: DataFrame, key: list[str]) -> DataFrame:
    """Rows per duplicated key (empty ⇒ PK holds).  One hash aggregate."""
    return (
        df.groupBy(*key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


def not_null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Count of NULLs per declared NOT NULL column (all zero ⇒ holds)."""
    return df.agg(
        *[
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}")
            for c in cols
        ]
    )


def fk_violations(
    child: DataFrame, child_cols: list[str], parent: DataFrame, parent_cols: list[str]
) -> DataFrame:
    """Child rows whose FK has no parent (empty ⇒ FK holds).  Left-anti
    join; the parent side reduces to distinct keys (broadcastable dims).

    ANSI MATCH SIMPLE: a child row with NULL in ANY FK column satisfies
    the constraint (nullable FKs are legal) and is excluded from the
    check — only fully-non-NULL keys must find a parent."""
    parent_keys = parent.select(
        *[F.col(p).alias(c) for c, p in zip(child_cols, parent_cols)]
    ).distinct()
    non_null = None
    cond = None
    for c in child_cols:
        term = child[c] == parent_keys[c]
        cond = term if cond is None else cond & term
        nn = child[c].isNotNull()
        non_null = nn if non_null is None else non_null & nn
    return child.where(non_null).join(parent_keys, on=cond, how="left_anti")


#: Declared constraints for the driver star schema (what a reference
#: CREATE TABLE script for these tables would say).
STAR_SCHEMA_CONSTRAINTS: dict[str, TableConstraints] = {
    "region": TableConstraints(primary_key=["r_regionkey"], not_null=["r_regionkey"]),
    "nation": TableConstraints(
        primary_key=["n_nationkey"],
        not_null=["n_nationkey"],
        foreign_keys=[(["n_regionkey"], "region", ["r_regionkey"])],
    ),
    "customer": TableConstraints(
        primary_key=["c_custkey"],
        not_null=["c_custkey"],
        foreign_keys=[(["c_nationkey"], "nation", ["n_nationkey"])],
    ),
    "supplier": TableConstraints(
        primary_key=["s_suppkey"],
        foreign_keys=[(["s_nationkey"], "nation", ["n_nationkey"])],
    ),
    "part": TableConstraints(primary_key=["p_partkey"]),
    "orders": TableConstraints(
        primary_key=["o_orderkey"],
        foreign_keys=[(["o_custkey"], "customer", ["c_custkey"])],
    ),
    # NOTE: the driver's synthetic lineitem does NOT honor TPC-H's
    # (l_orderkey, l_linenumber) PK (thousands of duplicates at every sf) —
    # declared here as in the TPC-H spec; validation REPORTS the violations
    # (see ck1_constraints), it does not assume they are zero.
    "lineitem": TableConstraints(
        primary_key=["l_orderkey", "l_linenumber"],
        foreign_keys=[
            (["l_orderkey"], "orders", ["o_orderkey"]),
            (["l_partkey"], "part", ["p_partkey"]),
            (["l_suppkey"], "supplier", ["s_suppkey"]),
        ],
    ),
}
