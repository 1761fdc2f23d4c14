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
        StructField("last_ts", TimestampType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this micro-batch's events for one user into running state.
    ``last_ts`` is part of the STATE (merged with max), not a per-batch
    value: late-arriving data must never move the profile's last event
    time backwards."""
    n, s, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
        ts_max = pdf["ts"].max()
        if ts_max is not pd.NaT:
            py_ts = ts_max.to_pydatetime()
            last_ts = py_ts if last_ts is None else max(last_ts, py_ts)
    state.update((n, s, last_ts))
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


# ----------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 arbitrary-state API
# ----------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma_value", DoubleType()),
    ]
)


def make_ewma_processor(alpha: float = 0.25):
    """Per-user exponentially-weighted moving average of ``value`` as a
    ``StatefulProcessor`` for ``transformWithStateInPandas`` — Spark 4's
    successor to applyInPandasWithState with *typed* state handles
    (ValueState/ListState/MapState), timers, and per-state TTL.

    State is one (n, ewma) pair per user in a ValueState cell; rows are
    folded in event-time order within each batch so replays are
    deterministic.  Requires the RocksDB state store provider — the same
    backend that keeps 100 TB-scale keyed state off the JVM heap."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EwmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ewma",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("ewma", DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, ewma = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            # concatenate ALL Arrow chunks before sorting: a group larger
            # than maxRecordsPerBatch arrives as several pdfs, and a
            # chunk-at-a-time sort would fold in arrival order across
            # chunks (the same fix as make_quota_admitter); composite
            # (ts, event_id) order makes ties deterministic too
            pdf = pd.concat(list(rows), ignore_index=True)
            if len(pdf):
                order = [c for c in ("ts", "event_id") if c in pdf.columns]
                for v in pdf.sort_values(order)["value"]:
                    v = float(v)
                    ewma = v if n == 0 else alpha * v + (1 - alpha) * ewma
                    n += 1
            self._state.update((n, ewma))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "ewma_value": [ewma]}
            )

        def close(self) -> None:
            pass

    return EwmaProcessor()


def user_ewma_stream(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Per-user EWMA over a streaming events frame via
    ``transformWithStateInPandas`` (update mode, processing-time).

    Environment gate: the API's state-server protocol imports
    ``google.protobuf`` at runtime; fail fast with a clear error where the
    dependency is absent (this container) instead of crashing the Python
    runner mid-query.  ``user_profile_stream`` covers the same custom-
    stateful surface on the protobuf-free applyInPandasWithState API."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(state-server wire protocol); install protobuf to enable this "
            "operator"
        ) from exc
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_ewma_processor(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ----------------------------------------------------------------------
# Per-key admission cap — streaming quota sampling
# ----------------------------------------------------------------------

ADMIT_STATE_SCHEMA = StructType([StructField("n_admitted", LongType())])


def make_quota_admitter(
    cap: int,
    output_schema: StructType,
    order_cols: tuple[str, ...] | list[str] = ("ts", "event_id"),
):
    """Build the applyInPandasWithState function for ``quota_admit_stream``:
    admit the first ``cap`` rows per key across the whole stream, drop the
    rest.

    The whole micro-batch group is concatenated BEFORE sorting: Arrow
    hands the group to Python in maxRecordsPerBatch-sized chunks, and a
    chunk-at-a-time admit would fall back to arrival order whenever a
    key's group spans chunks — breaking determinism and the equality with
    the batch dual.  Ordering is the composite ``order_cols`` (default
    ``(ts, event_id)``), exactly the batch ``quota_sample`` order, so ties
    on ``ts`` admit identically in both engines."""

    def admit(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (n,) = state.get if state.exists else (0,)
        if n < cap:
            pdf = pd.concat(list(batches), ignore_index=True)
            take = pdf.sort_values(list(order_cols)).head(cap - n)
            n += len(take)
            if len(take):
                yield take[[f.name for f in output_schema.fields]]
        state.update((n,))

    return admit


def quota_admit_stream(
    events: DataFrame,
    key_col: str = "event_type",
    cap: int = 100,
    order_cols: tuple[str, ...] | list[str] = ("ts", "event_id"),
) -> DataFrame:
    """Streaming per-key admission cap — the streaming counterpart of
    ``sampling.quota_sample``: at most ``cap`` rows per key pass through,
    first-come (composite ``order_cols`` event-time order within each
    micro-batch, chunk-concatenated so the order holds even when a group
    exceeds one Arrow batch), everything after is dropped at ingest.  The
    per-source rate-cap / class-balance primitive for a training-data
    firehose.

    Scale shape: state per key is ONE counter (8 bytes), hash-partitioned
    by key in the state store; saturated keys stop emitting but their
    counter persists for the stream's lifetime (bounded by key
    cardinality, not row count).  Batch duality: on a finite input the
    admitted multiset equals ``quota_sample`` by event-time rank
    (equality-tested).
    """
    out_schema = StructType(
        [f for f in events.schema.fields]
    )
    return events.groupBy(key_col).applyInPandasWithState(
        make_quota_admitter(cap, out_schema, order_cols),
        outputStructType=out_schema,
        stateStructType=ADMIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
