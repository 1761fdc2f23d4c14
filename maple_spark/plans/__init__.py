"""Plan introspection — SURVEY.md §2.11 (EXPLAIN/ANALYZE) and §4.

The reference prints plans via ``plans/PlanNode.java:263-341`` and gathers
table/column stats with ANALYZE (``commands/AnalyzeCommand.java:93``).
Spark equivalents plus assertion helpers used by tests to verify the plans
are *scale-shaped*: filters pushed into the Parquet scan, columns pruned,
broadcasts where expected — the properties that decide whether a query that
passes at sf0.01 survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """EXPLAIN equivalent (``commands/ExplainCommand.java:26-29``) —
    captures ``df.explain`` output as a string."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def analyze_table(spark: SparkSession, table: str, columns: list[str] | None = None) -> None:
    """ANALYZE equivalent (``commands/AnalyzeCommand.java``): compute table
    + column stats for CBO join reordering (reference ``qeval/TableStats``/
    ``ColumnStats`` analog)."""
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
        )
    else:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the physical plan shows Parquet-pushed filters."""
    s = explain_str(df)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def scan_read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from Parquet (ReadSchema lines) — verifies
    column pruning (the reference column store's late materialization)."""
    import re

    out: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        out.extend(p.split(":")[0] for p in m.group(1).split(",") if p)
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)
