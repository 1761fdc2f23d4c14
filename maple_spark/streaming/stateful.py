"""Custom stateful streaming operator via ``applyInPandasWithState``.

The Spark-native escape hatch for operators Structured Streaming lacks:
per-key arbitrary state carried across micro-batches.  Example operator:
a running per-user profile (event count, value sum, last event time) that
emits an updated row per key per micro-batch — the building block for
online feature stores / per-user rate limits.

Scale notes: state lives in the state store (RocksDB-backed on a real
cluster — set ``spark.sql.streaming.stateStore.providerClass``), hash-
partitioned by key; each micro-batch touches only keys present in the
batch.  Watermark-based state TTL belongs in production; the fixture
stream is finite so none is set here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this micro-batch's events for one user into running state."""
    n, s = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n, s))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [last_ts],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Stateful per-user running profile over a streaming events frame."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
