"""Structured Streaming over the ``events`` table (engine extension).

The reference has no streaming at all (SURVEY.md §2.10) — this module is
the north-star extension built the Spark way: the same declarative
transformations run in batch or as an incremental streaming query; only the
source/sink bind differently.  Every builder here therefore takes a plain
DataFrame, so correctness is checked in batch (DuckDB oracle) and the
streaming tests re-bind the identical logic to ``readStream``.
"""

from maple_spark.streaming.events import (
    read_events_stream,
    windowed_agg,
    hourly_agg_batch,
    sessionize,
)
from maple_spark.streaming.stateful import (
    quota_admit_stream,
    user_profile_stream,
)

__all__ = [
    "read_events_stream",
    "windowed_agg",
    "hourly_agg_batch",
    "sessionize",
    "quota_admit_stream",
    "user_profile_stream",
]
