"""Shared pipeline utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int = 16) -> DataFrame:
    """Ensure enough input partitions that per-row map work (shingling,
    hashing, dot products) parallelizes.

    A 100 TB corpus already arrives in thousands of partitions and skips
    this (no shuffle); the local single-file test fixture reads as ONE
    partition — without this every pipeline runs on one core.
    """
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df
