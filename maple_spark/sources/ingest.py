"""CSV ingest + per-column encoding analysis.

Reference parity:
- ``commands/LoadFileCommand.java:35-60``  → ``csv_to_parquet``
- ``storage/FileAnalyzer.java:48-238``     → ``analyze_encoding``
- encoding chooser thresholds (``FileAnalyzer.java:213-234``): RLE when
  runs/count < 0.25 on near-sorted data; DICTIONARY when distinct/count
  < 0.75 on unsorted data; else NONE.  (The reference phrases the RLE test
  as "runs/count > 0.75 compression win"; we report the same raw signals
  and apply the same decision boundaries.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def csv_to_parquet(
    spark: SparkSession,
    csv_path: str,
    out_path: str,
    schema: StructType | str | None = None,
    header: bool = False,
    sort_by: list[str] | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """LOAD/CREATE ... FROM FILE: CSV → Parquet with optional sort-by
    (better RLE/dict + min-max skipping — the Spark analog of the
    reference's analyze-then-encode write path)."""
    reader = spark.read.option("header", str(header).lower())
    reader = reader.schema(schema) if schema is not None else reader.option("inferSchema", "true")
    df = reader.csv(csv_path)
    out = df
    if sort_by:
        # Range-partitioned global sort → each output file covers a narrow
        # key range → tight parquet min/max stats (index-scan equivalent).
        out = out.repartitionByRange(partitions or 8, *sort_by).sortWithinPartitions(*sort_by)
    elif partitions:
        out = out.repartition(partitions)
    out.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def jsonl_to_parquet(
    spark: SparkSession,
    jsonl_path: str,
    out_path: str,
    schema: StructType | str | None = None,
    sort_by: list[str] | None = None,
    partitions: int | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON-lines → Parquet, the standard web-corpus ingest path.

    Always pass ``schema`` at scale: schema inference is a full extra read
    of the input.  Malformed lines (ubiquitous in crawled corpora) land in
    ``corrupt_col`` with every data field NULL (PERMISSIVE mode) instead of
    failing the job — filter or quarantine them downstream; the column is
    dropped from the Parquet output when clean.
    """
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", corrupt_col
    )
    if schema is not None:
        if isinstance(schema, str):
            from pyspark.sql.types import _parse_datatype_string

            schema = _parse_datatype_string(schema)
        if corrupt_col not in schema.fieldNames():
            schema = schema.add(corrupt_col, "string")
        reader = reader.schema(schema)
    df = reader.json(jsonl_path)
    clean = df
    if corrupt_col in df.columns:
        clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    out = clean
    if sort_by:
        out = out.repartitionByRange(partitions or 8, *sort_by).sortWithinPartitions(
            *sort_by
        )
    elif partitions:
        out = out.repartition(partitions)
    out.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def analyze_encoding(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column {count, distinct, runs, sorted_ratio} + chosen encoding —
    the ``FileAnalyzer`` report as a DataFrame.

    run/sortedness need row adjacency: computed per input order using a
    window over a monotonic id.  This is an offline layout-analysis tool
    (run at ingest like the reference does), not a hot-path operator; it is
    one pass + one small shuffle per column.
    """
    cols = columns or df.columns
    with_id = df.withColumn("__rid", F.monotonically_increasing_id())
    w = Window.orderBy("__rid")
    reports = []
    for c in cols:
        lagged = with_id.select(
            F.col(c).alias("v"), F.lag(c).over(w).alias("prev")
        )
        rep = lagged.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("v").alias("n_distinct"),
            (F.sum(F.when(~F.col("v").eqNullSafe(F.col("prev")), 1).otherwise(0)) + 1).alias("n_runs"),
            F.avg(
                F.when(F.col("prev").isNull() | (F.col("v") >= F.col("prev")), 1.0).otherwise(0.0)
            ).alias("sorted_ratio"),
        ).withColumn("column", F.lit(c))
        reports.append(rep)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "column",
        "n",
        "n_distinct",
        "n_runs",
        F.round("sorted_ratio", 4).alias("sorted_ratio"),
        F.when(
            (F.col("n_runs") / F.col("n") < 0.25) & (F.col("sorted_ratio") > 0.9),
            F.lit("RLE"),
        )
        .when(F.col("n_distinct") / F.col("n") < 0.75, F.lit("DICTIONARY"))
        .otherwise(F.lit("NONE"))
        .alias("encoding"),
    )
