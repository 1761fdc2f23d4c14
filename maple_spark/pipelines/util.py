"""Shared pipeline utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_df(df: DataFrame, eager: bool = True) -> DataFrame:
    """The ONE plan-truncation primitive for multiply-consumed
    intermediates (guide §5): ``localCheckpoint`` by default — executor-
    local blocks, no reliable storage round-trip, the right trade for a
    single-box bench and for any cluster where recomputing the lineage
    on executor loss is acceptable.

    ``SPARK_GRAFT_RELIABLE_CHECKPOINT`` routes every call site to a
    RELIABLE ``checkpoint`` instead (blocks written to the checkpoint
    dir, surviving executor loss — the 100 TB cluster escape hatch:
    localCheckpoint blocks die with their executor and kill the query
    mid-flight).  Set it to a directory path, or to ``1``/``true`` for
    a per-process default under /tmp.  Read per call, not at import, so
    a driver can flip modes between jobs; both modes are value-identical
    by construction (pytest pins one representative path)."""
    import os

    mode = os.environ.get("SPARK_GRAFT_RELIABLE_CHECKPOINT", "").strip()
    if not mode:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        if mode.lower() in ("1", "true", "yes"):
            mode = f"/tmp/maple_reliable_ckpt_{os.getpid()}"
        sc.setCheckpointDir(mode)
    return df.checkpoint(eager=eager)


def parquet_files_stats(df: DataFrame) -> tuple[int, int | None] | None:
    """(total_bytes, total_rows) of a DataFrame's LOCAL parquet files —
    metadata only (file sizes + parquet footer row counts via pyarrow),
    no Spark job.  Returns ``None`` only when no file can even be
    *statted* (in-memory frames report no files; remote paths raise on
    getsize), so callers choose their own bounded fallback instead of
    silently scanning data.  A statable file whose parquet footer pyarrow
    cannot read degrades to ``(total_bytes, None)`` — bytes stay accurate
    and size-proportional consumers (shard packing) keep scaling, while
    row-count consumers treat ``rows=None`` as unknown.  Shared by the
    sequence-pack shard sizing (``__spark_entry__._pack_shards``) and the
    exact-Jaccard tier router (``dedup.ngram_jaccard_pairs_best``) — one
    URI-handling path to maintain."""
    import os

    import pyarrow.parquet as pq

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total_bytes = 0
    total_rows: int | None = 0
    for f in files:
        path = f[len("file:"):] if f.startswith("file:") else f
        try:
            total_bytes += os.path.getsize(path)
        except Exception:
            return None  # remote / unstatable: bytes unknowable cheaply
        if total_rows is not None:
            try:
                total_rows += pq.ParquetFile(path).metadata.num_rows
            except Exception:
                total_rows = None  # footer unreadable: rows unknown
    return total_bytes, total_rows


def spread(df: DataFrame, min_partitions: int = 16) -> DataFrame:
    """Ensure enough input partitions that per-row map work (shingling,
    hashing, dot products) parallelizes.

    A 100 TB corpus already arrives in thousands of partitions and skips
    this (no shuffle); the local single-file test fixture reads as ONE
    partition — without this every pipeline runs on one core.

    The check counts *input files* (cheap catalog metadata) instead of
    ``df.rdd.getNumPartitions()``: the RDD conversion forces full physical
    planning of the frame at construction time, which is pure driver
    overhead on wide plans.  File count under-approximates partitions
    (Spark splits large files), so at scale — many files — this correctly
    skips; only small local fixtures trigger the repartition.  Non-file
    sources (in-memory test frames) report zero files and are left alone:
    createDataFrame already spreads over defaultParallelism.
    """
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < min_partitions:
        return df.repartition(min_partitions)
    return df
