"""Scan operators — SURVEY.md §2.1 (S1, S2, S5-S7).

Reference: ``plans/FileScanNode.java:18`` (heap scan with optional inlined
predicate) and ``plans/CSFileScanNode.java:18`` (per-column block scan with
late materialization).  In Spark both collapse into a single Parquet scan:
``.select`` prunes columns (late materialization) and ``.filter`` predicates
are pushed into the scan by Catalyst (visible as ``PushedFilters`` in
``.explain``), so the row-store/column-store distinction disappears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import StructType

from maple_spark.catalog import load_table


def scan(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    predicate: Column | str | None = None,
) -> DataFrame:
    """FileScanNode / CSFileScanNode equivalent.

    ``columns`` → Parquet column pruning (reads only those column chunks);
    ``predicate`` → pushed filter (row-group skipping via min/max stats —
    the Spark analog of the reference's intended-but-stubbed IndexScanNode,
    ``plans/IndexScanNode.java:17``).
    """
    df = load_table(spark, sf_dir, table)
    if predicate is not None:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = False,
) -> DataFrame:
    """CSV ingest (reference ``commands/LoadFileCommand.java:35-60`` and
    ``CreateTableFromFileCommand.java:49``).

    With an explicit schema Spark skips the inference pass — one read of the
    data, exactly like the reference's single-pass ``FileAnalyzer``.
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
