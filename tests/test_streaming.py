"""Structured Streaming tests: batch/stream duality of the event operators.

The streaming path re-binds the same logical plan to readStream and must
produce the batch answer (Structured Streaming's core guarantee)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR, rows


def test_windowed_agg_stream_equals_batch(spark):
    from maple_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        windowed_agg,
    )
    from maple_spark.catalog import load_table

    batch = windowed_agg(load_table(spark, SF_DIR, "events"), "1 hour")
    stream = windowed_agg(
        read_events_stream(spark, SF_DIR), "1 hour", watermark="2 hours"
    )
    q = run_stream_to_memory(stream, "win_agg_test", timeout_sec=120)
    got = rows(spark.sql("SELECT * FROM win_agg_test"))
    want = rows(batch)
    q.stop()
    assert got == want


def test_sessionize_batch_shape(spark):
    from maple_spark.catalog import load_table
    from maple_spark.streaming.events import sessionize

    out = sessionize(load_table(spark, SF_DIR, "events"), gap="30 minutes")
    first = out.orderBy("user_id", "session_start").first()
    assert first["session_end"] >= first["session_start"]
    assert out.where(F.col("n_events") < 1).count() == 0


def test_sliding_window(spark):
    from maple_spark.catalog import load_table
    from maple_spark.streaming.events import windowed_agg

    e = load_table(spark, SF_DIR, "events")
    tumbling = windowed_agg(e, "1 hour")
    sliding = windowed_agg(e, "1 hour", slide="30 minutes")
    # each event lands in exactly 2 sliding windows
    assert (
        sliding.agg(F.sum("n_events")).collect()[0][0]
        == 2 * tumbling.agg(F.sum("n_events")).collect()[0][0]
    )
