"""User-defined function surface — SURVEY.md §2.9.

The reference exposes an extensible scalar-function registry
(``functions/FunctionDirectory.addFunction``, ``FunctionDirectory.java:79-99``)
and an ``AggregateFunction`` contract (clear/add/getResult,
``functions/AggregateFunction.java:7-33``) that is never wired in.  Spark
equivalents, in preference order:

1. built-in Column expressions (always first choice — JVM, codegen)
2. ``pandas_udf`` — Arrow-vectorized, ~10-100× faster than row UDFs
3. ``spark.udf.register`` row-at-a-time Python UDF (last resort)

This module ships one production-shaped example of each UDF kind so the
extension path is tested, plus the registry helper.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType


@pandas_udf(StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: lowercase, trim, collapse whitespace — the
    canonical text-normalization step before dedup/fingerprinting.
    Arrow-batched: one Python call per ~10k rows, not per row."""
    return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)


@pandas_udf(DoubleType())
def vec_norm(v: pd.Series) -> pd.Series:
    """Vectorized UDF over array<float>: L2 norm via NumPy per batch.
    Demonstrates the numeric-kernel shape (embedding ops) where NumPy
    beats per-element Catalyst expressions."""
    import numpy as np

    return v.map(lambda a: float(np.sqrt(np.dot(a, a))) if a is not None else None)


def register_all(spark: SparkSession) -> None:
    """FunctionDirectory.addFunction analog: make the UDFs callable from
    SQL (``SELECT normalize_text(text) FROM documents``)."""
    spark.udf.register("normalize_text", normalize_text)
    spark.udf.register("vec_norm", vec_norm)


class RunningSumAggregate:
    """Reference ``AggregateFunction`` contract (clear/add/getResult) —
    provided for parity documentation.  In Spark the same custom
    aggregation is a ``pandas_udf`` GROUPED_AGG or, better, a builtin."""

    def __init__(self):
        self._sum = None

    def clear(self):
        self._sum = None

    def add(self, v):
        if v is not None:
            self._sum = v if self._sum is None else self._sum + v

    def get_result(self):
        return self._sum


@pandas_udf(DoubleType())
def grouped_sum_udaf(v: pd.Series) -> float:  # GROUPED_AGG pandas UDF
    """UDAF example (SUM reimplementation — use F.sum in real code)."""
    return float(v.sum()) if len(v) else None
