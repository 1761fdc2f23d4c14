"""Table catalog over the driver-provided Parquet directories.

Reference analog: the reference opens tables through ``StorageManager`` /
``TableManager`` (``storage/StorageManager.java``) and caches open table
files; schema lives in the table-file header page.  Here a "table" is a
Parquet file (self-describing schema) and the catalog is a thin loader that
also registers temp views so the same queries run through ``spark.sql``.

Scale note: at 100 TB each table would be a partitioned Parquet *directory*
(e.g. ``orders/o_orderdate=.../part-*.parquet``); ``spark.read.parquet``
handles both layouts identically, and partition pruning comes free when the
path layout carries partition columns.  Nothing here assumes single-file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be broadcast in joins.  At
#: 100 TB, region/nation/supplier/part remain tiny relative to the fact
#: tables (classic TPC-H shape) — broadcasting them avoids shuffling the
#: fact side entirely.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as Parquet TIMESTAMP(NANOS) — Spark has no nanosecond
    timestamp type and refuses to read them without the legacy long mode."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        schema = ds.dataset(path, format="parquet").schema
        return [
            f.name
            for f in schema
            if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table.  Column pruning + predicate pushdown happen in the
    Parquet scan as long as callers keep the plan declarative.

    Nanosecond-timestamp columns (e.g. ``events.ts``) are read via the
    ``nanosAsLong`` legacy mode and truncated to microseconds with *integer*
    division (a double division would lose precision on int64 nanos) —
    matching DuckDB/Arrow ns→us truncation so oracle comparisons agree.
    """
    from pyspark.sql import functions as F

    from pyspark.sql.types import LongType

    path = table_path(sf_dir, name)
    # Runtime guard for sessions created outside get_spark(): NTZ-flavored
    # parquet timestamps (isAdjustedToUTC=false) must read as TIMESTAMP so
    # event-time ops (watermarks, windows) accept them and the UTC-pinned
    # session matches the DuckDB oracle.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ns_cols = _nanos_timestamp_cols(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    # Arrow reports both INT64 TIMESTAMP(NANOS) and legacy INT96 as "ns",
    # but Spark reads INT96 as a real timestamp natively — only columns
    # that actually surfaced as longs need the ns→us truncation.
    for c in ns_cols:
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> dict[str, DataFrame]:
    """Register every table as a temp view (idempotent) and return the dfs.

    This is the equivalent of the reference's per-session open-table map and
    lets SQL-dialect entry points (``spark.sql``) see the same catalog the
    DataFrame builders use.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
