"""Deterministic sampling / split operators for training-data pipelines.

Random splits are useless at 100 TB: re-runs must land every document in
the same split (resumability, leakage audits), so everything here keys on
a *content-stable hash* of the id, never ``rand()``.

- ``hash_split``: md5-bucket train/valid/test assignment.  md5 (not
  xxhash64) because it is bit-identical across engines — the DuckDB
  oracle computes the same buckets, making the split itself part of the
  correctness gate.
- ``quota_sample``: per-group cap (e.g. at most N docs per language) via
  a rank window over a deterministic order — the class-rebalancing
  primitive.  One shuffle on the group key; skewed groups are bounded by
  the cap itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Assign each row to train/valid/test by md5(id) bucket in [0, 100).

    The bucket is the first 4 hex digits of md5(cast(id as string)) mod
    100 — uniform, deterministic, engine-portable.  Adding data never
    reshuffles existing assignments (unlike ``rand(seed)`` which depends
    on partitioning)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % 100
    )
    split = (
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + valid_pct, "valid")
        .otherwise("test")
    )
    return df.withColumn("bucket", bucket).withColumn("split", split)


def quota_sample(
    df: DataFrame, group_col: str | list[str], order_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per group (single column or composite),
    chosen by ascending ``order_col`` (deterministic — no sampling
    noise).  The balanced-corpus primitive: cap over-represented
    languages/sources instead of global downsampling."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    w = Window.partitionBy(*groups).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= cap)
        .drop("rk")
    )
