"""Shared pipeline utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
