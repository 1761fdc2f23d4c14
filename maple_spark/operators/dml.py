"""DML as Parquet rewrite — SURVEY.md §2.11.

Reference: INSERT (``commands/InsertCommand.java:160-185``), UPDATE
(``commands/UpdateCommand.java:30`` — scan + mutate via TupleUpdater), and
DELETE (``commands/DeleteCommand.java:35``) mutate slotted heap pages in
place under WAL protection.  Parquet is immutable, so the Spark-native
equivalents are:

- INSERT        → append new files to the table directory
- UPDATE/DELETE → read → transform → write to a new location (or overwrite
                  via a staging dir) — deterministic read-filter-rewrite

On a real deployment these are one-liners on a lakehouse table format
(Delta/Iceberg ``MERGE``/``DELETE`` with ACID + file-level skipping); the
helpers below keep the engine dependency-free while preserving semantics.
Transactions (BEGIN/COMMIT/ROLLBACK, ``commands/*TransactionCommand.java``)
are out of scope per BASELINE.json — batch engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Row, SparkSession


def insert_rows(
    spark: SparkSession, target_path: str, rows: list[dict], schema=None
) -> None:
    """INSERT ... VALUES: append a small DataFrame to the table directory.
    Scale note: many tiny inserts create a small-files problem — batch
    writers should buffer and compact (see OPTIMIZE, ``compact`` below)."""
    df = spark.createDataFrame([Row(**r) for r in rows], schema=schema)
    df.write.mode("append").parquet(target_path)


def insert_select(df: DataFrame, target_path: str) -> None:
    """INSERT ... SELECT (``InsertCommand.java:41`` TupleInserter path)."""
    df.write.mode("append").parquet(target_path)


def update_where(
    df: DataFrame, cond: Column, assignments: dict[str, Column]
) -> DataFrame:
    """UPDATE ... SET ... WHERE as a pure transformation: rows matching
    ``cond`` get each assignment applied; others pass through unchanged.
    Caller persists with ``overwrite_table``.

    All assignments evaluate against the PRE-update row (one projection),
    per SQL semantics: ``SET a = b, b = a`` swaps — chained withColumn
    would feed the already-updated ``a`` into ``b``'s expression."""
    from pyspark.sql import functions as F

    return df.select(
        *[
            F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in df.columns
        ]
    )


def delete_where(df: DataFrame, cond: Column) -> DataFrame:
    """DELETE ... WHERE as a pure transformation (keep non-matching rows)."""
    return df.filter(~cond | cond.isNull())


def overwrite_table(df: DataFrame, target_path: str) -> None:
    """Persist a rewritten table.  Writes to the final path with overwrite
    mode; Spark stages to ``_temporary`` and commits, so a failed job leaves
    no partial visible state on a real FileSystem committer."""
    df.write.mode("overwrite").parquet(target_path)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: list[str],
    update_cols: list[str] | None = None,
) -> DataFrame:
    """MERGE/upsert as a pure transformation (the lakehouse MERGE INTO
    semantics on plain Parquet): matched target rows take the source's
    values for ``update_cols`` (default: all non-key columns); unmatched
    source rows are inserted; other target rows pass through.

    Implemented as full-outer join on the key + a source-presence marker —
    one shuffle on the key for each side, no driver round-trips.  The
    marker (not ``coalesce(s.c, t.c)``) decides per ROW which side wins:
    a matched source row with a NULL value APPLIES the NULL, as MERGE
    requires — coalesce could not distinguish "matched with NULL" from
    "no source row".  On Delta/Iceberg this maps 1:1 to ``MERGE INTO``
    with file-level pruning.
    """
    from pyspark.sql import functions as F

    cols = target.columns
    update_cols = update_cols or [c for c in cols if c not in key]
    t = target.alias("t")
    s = source.withColumn("__src", F.lit(1)).alias("s")
    cond = None
    for k in key:
        term = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = term if cond is None else cond & term
    joined = t.join(s, on=cond, how="full_outer")
    matched = F.col("s.__src").isNotNull()
    out_cols = []
    for c in cols:
        if c in key:
            out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        elif c in update_cols and c in source.columns:
            out_cols.append(
                F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)


def compact(spark: SparkSession, path: str, target_partitions: int) -> DataFrame:
    """OPTIMIZE equivalent (``commands/OptimizeCommand.java:63``): coalesce
    a fragmented table directory into ``target_partitions`` files."""
    return spark.read.parquet(path).repartition(target_partitions)
