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
            # copy before extending: StructType.add mutates in place, and
            # the caller's schema object must not grow a corrupt column
            from pyspark.sql.types import StructType as _ST

            schema = _ST(list(schema.fields)).add(corrupt_col, "string")
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


#: formats Spark writes/reads natively in this container (avro needs the
#: external spark-avro package, so it is NOT offered here)
_CONVERT_FORMATS = ("parquet", "orc", "json", "csv")

#: compression codecs accepted per format — validated BEFORE any write:
#: mode('overwrite') clears an existing target directory before Spark
#: would reject a bogus codec, so `EXPORT t TO existing COMPRESSION bogus`
#: must fail while the previous export is still intact (ADVICE round 11).
#: Conservative subset of Spark 4's per-format codec tables, limited to
#: what this container's JVM carries (lzo/brotli need native libs).
_WRITE_CODECS = {
    "parquet": {"none", "uncompressed", "snappy", "gzip", "lz4", "lz4_raw", "zstd"},
    "orc": {"none", "uncompressed", "snappy", "zlib", "lz4", "zstd"},
    "csv": {"none", "uncompressed", "bzip2", "deflate", "gzip", "lz4", "snappy", "zstd"},
    "json": {"none", "uncompressed", "bzip2", "deflate", "gzip", "lz4", "snappy", "zstd"},
}


def write_and_reread(
    spark: SparkSession,
    df: DataFrame,
    out_path: str,
    out_format: str,
    sort_by: list[str] | None = None,
    partitions: int | None = None,
    preserve_schema: bool = True,
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> DataFrame:
    """The ONE writer/re-reader used by both :func:`convert_table` and
    :meth:`maple_spark.engine.MapleEngine.export` — the CSV header and
    re-read rules live here only, so the two surfaces cannot drift.

    CSV output forces a header so a round-trip keeps column names.  For
    the text formats (csv/json) the re-read applies the SOURCE frame's
    schema by default (``preserve_schema=True``): text carries no types,
    and an inferring re-read legally drifts (decimal→double,
    date→timestamp) — the returned frame must be the verification
    surface, so it is pinned to the source types.  Pass
    ``preserve_schema=False`` to get the old inferring behavior (what an
    out-of-band consumer with no schema would see).  Parquet/ORC are
    self-describing; the flag is a no-op there.

    One map-only read-write pass plus the optional range shuffle — the
    sort-by layout yields tight min-max stats (parquet pages / ORC
    stripes both) so filters skip at the native reader.

    ``partition_by`` writes a Hive-partitioned layout
    (``col=value/...`` directories) — the 100 TB table layout: a filter
    on a partition column prunes whole directories at planning time
    (``PartitionFilters`` in the scan, pinned in tests) instead of
    reading data files at all.  Partition columns are low-cardinality
    by contract (each value is a directory); re-reads pin the SOURCE
    schema for every format here, because partition-column types are
    otherwise re-INFERRED from directory names (an int-looking string
    partition value would come back int).  Composable with ``sort_by``
    for in-file ordering within each partition.
    """
    if out_format not in _CONVERT_FORMATS:
        raise ValueError(
            f"convert/export supports {_CONVERT_FORMATS}, got {out_format!r}"
        )
    if compression is not None:
        # fold case first — Spark itself accepts 'ZSTD'/'Snappy', so the
        # whitelist must not reject spellings the writer would take
        # (round-12 review); then validate BEFORE mode('overwrite')
        # touches the target: a bad codec must not destroy the previous
        # export (ADVICE round 11)
        compression = compression.lower()
        if compression not in _WRITE_CODECS[out_format]:
            raise ValueError(
                f"{out_format} compression must be one of "
                f"{sorted(_WRITE_CODECS[out_format])}, got {compression!r}"
            )
    out = df
    if sort_by:
        out = out.repartitionByRange(partitions or 8, *sort_by).sortWithinPartitions(
            *sort_by
        )
    elif partitions:
        out = out.repartition(partitions)
    writer = out.write.mode("overwrite")
    if out_format == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        # per-write codec choice (e.g. zstd for cold archives, snappy/
        # lz4 for hot scan paths) — at 100 TB the scan-speed-vs-size
        # trade is per-table policy, not a cluster-wide default; the
        # codec was whitelist-validated above, BEFORE the overwrite
        writer = writer.option("compression", compression)
    writer.format(out_format).save(out_path)
    back = spark.read
    if out_format == "csv":
        back = back.option("header", "true")
    if out_format in ("csv", "json") or partition_by:
        if preserve_schema:
            back = back.schema(df.schema)
        elif out_format == "csv":
            back = back.option("inferSchema", "true")
    got = back.format(out_format).load(out_path)
    if partition_by and preserve_schema:
        # partitioned reads append partition columns last regardless of
        # the supplied schema; restore the source column order so the
        # round-trip is schema-IDENTICAL, not just schema-equivalent
        got = got.select(*df.columns)
    return got


def convert_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    out_format: str = "orc",
    in_format: str = "parquet",
    sort_by: list[str] | None = None,
    partitions: int | None = None,
    preserve_schema: bool = True,
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> DataFrame:
    """Table format conversion — the interchange surface the reference's
    single CSV loader never had: any natively-supported columnar/text
    format to any other, with the same optional sort-by-range layout as
    the CSV path (tight min-max stats on the sorted columns for both
    parquet AND orc — ORC carries per-stripe statistics and Spark pushes
    filters into the native ORC reader just like parquet, pinned in
    tests/test_sources.py).  Writer + re-read rules are shared with
    ``engine.export`` via :func:`write_and_reread` (CSV headers,
    schema-pinned text re-reads).  A CSV *input* with no sidecar schema
    is still inferred — there is nothing to preserve on that side."""
    # validate BOTH sides before any I/O: an inferring CSV input read is
    # a full-file scan, and it must not run just to discover a bad
    # out_format (review finding, round 11)
    if in_format not in _CONVERT_FORMATS or out_format not in _CONVERT_FORMATS:
        raise ValueError(
            f"convert_table supports {_CONVERT_FORMATS}, got "
            f"{in_format!r} -> {out_format!r}"
        )
    reader = spark.read
    if in_format == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    df = reader.format(in_format).load(in_path)
    return write_and_reread(
        spark, df, out_path, out_format,
        sort_by=sort_by, partitions=partitions, preserve_schema=preserve_schema,
        partition_by=partition_by, compression=compression,
    )


def analyze_encoding(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column {count, distinct, runs, sorted_ratio} + chosen encoding —
    the ``FileAnalyzer`` report as a DataFrame.

    run/sortedness need row adjacency in input order.  Adjacency is almost
    entirely *within* partitions, so the lag window partitions by
    ``spark_partition_id()`` (parallel, one shuffle for ALL columns) and
    only the per-partition boundary rows — one row per partition, a tiny
    table — go through a global window to stitch the partition-crossing
    adjacencies.  The previous formulation windowed the whole table into a
    single task per column; at 100 TB that is one executor sorting the
    world, N-columns times.

    The two formulations are equality-tested (`test_sources`): for every
    row, "previous value" below is the same value the global-window lag
    produced — a missing previous row and a NULL previous value are
    indistinguishable to both eqNullSafe and the >= comparison, so the
    boundary stitch needs no row/NULL marker.
    """
    cols = columns or df.columns
    flagged = df.select(
        F.spark_partition_id().alias("__pid"),
        F.monotonically_increasing_id().alias("__rid"),
        *[F.col(c) for c in cols],
    )
    wp = Window.partitionBy("__pid").orderBy("__rid")
    lagged = flagged.select(
        "__pid",
        "__rid",
        F.row_number().over(wp).alias("__rn"),
        *[F.col(c) for c in cols],
        *[F.lag(c).over(wp).alias(f"__prev_{c}") for c in cols],
    )
    # Per-partition partials: interior-row change/nondesc counts plus the
    # boundary (first/last) values, extracted deterministically via
    # struct-min/max on the row id.
    per_part_aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        v, prev = F.col(c), F.col(f"__prev_{c}")
        interior = F.col("__rn") > 1
        per_part_aggs += [
            F.sum(
                F.when(interior & ~v.eqNullSafe(prev), 1).otherwise(0)
            ).alias(f"__chg_{c}"),
            F.sum(
                F.when(interior & (prev.isNull() | (v >= prev)), 1).otherwise(0)
            ).alias(f"__nd_{c}"),
            F.min(F.struct(F.col("__rid").alias("r"), v.alias("v")))["v"].alias(
                f"__first_{c}"
            ),
            F.max(F.struct(F.col("__rid").alias("r"), v.alias("v")))["v"].alias(
                f"__last_{c}"
            ),
        ]
    parts = lagged.groupBy("__pid").agg(*per_part_aggs)
    # Stitch boundaries: each partition's first row pairs with the previous
    # partition's last value.  One row per partition — the global window is
    # over a metadata-sized table, not the data.
    wg = Window.orderBy("__pid")
    stitched_cols = [F.col("__n")]
    for c in cols:
        first = F.col(f"__first_{c}")
        prev_last = F.lag(f"__last_{c}").over(wg)
        stitched_cols += [
            (
                F.col(f"__chg_{c}")
                + F.when(~first.eqNullSafe(prev_last), 1).otherwise(0)
            ).alias(f"__chg_{c}"),
            (
                F.col(f"__nd_{c}")
                + F.when(prev_last.isNull() | (first >= prev_last), 1).otherwise(0)
            ).alias(f"__nd_{c}"),
        ]
    stitched = parts.select(*stitched_cols)
    total_aggs = [F.sum("__n").alias("n")]
    for c in cols:
        total_aggs += [
            (F.sum(f"__chg_{c}") + 1).alias(f"__runs_{c}"),
            (F.sum(f"__nd_{c}") / F.sum("__n")).alias(f"__sr_{c}"),
        ]
    totals = stitched.agg(*total_aggs)
    # distinct counts: one map-side-partial pass over the data, no window
    distinct = df.agg(
        *[F.approx_count_distinct(c).alias(f"__dist_{c}") for c in cols]
    )
    wide = totals.crossJoin(distinct)
    # unpivot the single wide row into the per-column report
    stack_expr = ", ".join(
        f"'{c}', __dist_{c}, __runs_{c}, __sr_{c}" for c in cols
    )
    report = wide.select(
        "n",
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS "
            "(column, n_distinct, n_runs, sorted_ratio_raw)"
        ),
    )
    return report.select(
        "column",
        "n",
        "n_distinct",
        "n_runs",
        F.round("sorted_ratio_raw", 4).alias("sorted_ratio"),
        F.when(
            (F.col("n_runs") / F.col("n") < 0.25) & (F.col("sorted_ratio_raw") > 0.9),
            F.lit("RLE"),
        )
        .when(F.col("n_distinct") / F.col("n") < 0.75, F.lit("DICTIONARY"))
        .otherwise(F.lit("NONE"))
        .alias("encoding"),
    )


def text_to_parquet(
    spark: SparkSession,
    text_path: str,
    out_path: str,
    partitions: int | None = None,
) -> DataFrame:
    """Raw text-lines → documents-shaped Parquet: one row per line with
    (doc_id, text, source_file).

    ``doc_id`` is md5 of the line content — deterministic across re-runs,
    partitionings, and corpus growth (a positional id from
    ``monotonically_increasing_id`` is none of those), and 128 bits keeps
    collisions negligible at trillion-line scale.  Identical lines get
    identical ids BY DESIGN: they are the same document, and this ingest
    collapses them with a hash group-by (map-side partial agg + ONE
    shuffle on doc_id — not map-only; the dedup is the cost of a stable
    id).  The surviving ``source_file`` is the MINIMUM across duplicate
    holders, so which provenance wins is deterministic across runs and
    partitionings, unlike ``dropDuplicates`` (whichever row a task sees
    first).  ``text`` is functionally determined by ``doc_id``, so min()
    is exact for it, not a choice.
    """
    df = (
        spark.read.text(text_path)
        .where(F.length("value") > 0)
        .select(
            F.md5("value").alias("doc_id"),
            F.col("value").alias("text"),
            F.input_file_name().alias("source_file"),
        )
        .groupBy("doc_id")
        .agg(F.min("text").alias("text"), F.min("source_file").alias("source_file"))
    )
    if partitions:
        df = df.repartition(partitions)
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
