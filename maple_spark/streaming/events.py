"""Event-stream operators: tumbling/sliding windows, watermarks, sessions.

Batch/stream duality: ``windowed_agg`` and ``sessionize`` accept either a
batch DataFrame or a streaming one — Structured Streaming's contract is that
the same logical plan runs incrementally.  Watermarks only apply on the
streaming path (they bound state, which is what makes the operator viable on
an unbounded 100 TB/day stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events parquet (each file = one
    micro-batch).  In production this binds to Kafka with the same schema;
    everything downstream is unchanged."""
    import os
    import tempfile

    from maple_spark.catalog import _nanos_timestamp_cols

    path = f"{sf_dir}/events.parquet"
    # NTZ-flavored parquet timestamps must read as TIMESTAMP — Structured
    # Streaming rejects TIMESTAMP_NTZ event-time columns in withWatermark.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(path)
    if os.path.isfile(path):
        # Spark's file stream source requires a *directory* (it tails new
        # files); expose the single driver-provided file through a temp dir
        # of symlinks.  The dir name is DETERMINISTIC per source path:
        # checkpoints record the source location, so a restart must resolve
        # to the same directory or recovery fails.  A production deployment
        # streams a landing directory or Kafka — this shim only serves the
        # test fixture layout.
        import hashlib

        tag = hashlib.md5(path.encode()).hexdigest()[:12]
        d = os.path.join(tempfile.gettempdir(), f"maple_events_stream_{tag}")
        os.makedirs(d, exist_ok=True)
        link = os.path.join(d, "part-000.parquet")
        # lexists, not exists: a dangling symlink (fixture moved/recreated)
        # reports exists()=False but still blocks os.symlink — relink it
        if os.path.lexists(link) and not os.path.exists(link):
            os.unlink(link)
        if not os.path.lexists(link):
            os.symlink(path, link)
        path = d
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    # Arrow reports both INT64 TIMESTAMP(NANOS) and legacy INT96 as "ns",
    # but Spark reads INT96 as a real timestamp natively — only columns
    # that actually surfaced as longs need the ns→us truncation (same
    # guard as catalog.load_table).
    from pyspark.sql.types import LongType

    for c in ns_cols:
        if isinstance(stream.schema[c].dataType, LongType):
            stream = stream.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000"))
            )
    return stream


def windowed_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding) window aggregation by event_type:
    count + exact decimal sum of ``value``.

    On a stream, ``watermark`` (e.g. "2 hours") lets Spark finalize and
    evict window state once event-time passes window_end + delay — bounded
    state, late rows within the delay still merge in.
    """
    e = events
    if watermark and e.isStreaming:
        e = e.withWatermark("ts", watermark)
    win = F.window("ts", window_duration, slide) if slide else F.window("ts", window_duration)
    return (
        e.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hll_registers_stream(
    events: DataFrame,
    col: str = "user_id",
    p: int = 12,
    window_duration: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Windowed HyperLogLog register maintenance on a stream: one row per
    (window, register) carrying the max rank — the streaming half of the
    a15 dataflow sketch (``functions/sketch.hll_reg_rho`` supplies the
    identical register math, so stream and batch registers are
    bit-equal; equality-tested in test_streaming).

    This is the mergeable-sketch firehose pattern: per-window distinct
    counts on unbounded input with state ≤ 2^p rows per live window —
    ``max`` is the one aggregate HLL needs, and it is streaming-native
    (partial max map-side, final max in the state store; watermark
    evicts closed windows).  The cardinality ESTIMATE is a read-time
    projection over the tiny register table
    (``functions/sketch.hll_estimate``) — keeping the stateful op to a
    single aggregation, which Structured Streaming supports everywhere
    (chained stateful aggs are mode-restricted).
    """
    from maple_spark.functions.sketch import hll_reg_rho

    e = events.where(F.col(col).isNotNull())
    if watermark and e.isStreaming:
        e = e.withWatermark("ts", watermark)
    reg, rho = hll_reg_rho(F.col(col), p)
    return (
        e.select(F.window("ts", window_duration).alias("w"), reg.alias("reg"), rho.alias("rho"))
        .groupBy("w", "reg")
        .agg(F.max("rho").alias("rho"))
        .select(
            F.col("w.start").alias("window_start"),
            "reg",
            "rho",
        )
    )


def hourly_agg_batch(events: DataFrame) -> DataFrame:
    """date_trunc formulation of the hourly rollup — semantically the
    tumbling window above (epoch-aligned 1h buckets), expressed so the
    DuckDB oracle is a verbatim twin."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = None
) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other merge
    into one session (``session_window`` — Spark's built-in stateful session
    operator; state per open session, evicted by watermark on streams)."""
    e = events
    if watermark and e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup on ``keys`` (default: event_id) — the ingest
    guard that turns an at-least-once source (Kafka replays, retried
    producers) into exactly-once downstream.

    On a stream this uses ``dropDuplicatesWithinWatermark``: the seen-key
    state is evicted once event time passes the watermark delay, so state
    is bounded by (arrival rate × delay) instead of growing forever —
    the property that makes dedup viable on an unbounded stream.  The
    batch path is plain ``dropDuplicates`` (same semantics on finite
    input, duality tested)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def enrich_stream(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (periodically refreshed) dimension snapshot — the standard pattern for
    attaching user/account attributes to an event stream.  The static side
    is broadcast per micro-batch; no stream state is required, so this
    scales with the dimension size only."""
    from pyspark.sql import functions as F

    return events.join(F.broadcast(user_dim), on="user_id", how="left")


def join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on ``key`` with an event-time band: right rows
    join left rows whose timestamp falls in [l.ts, l.ts + within).

    Both sides carry watermarks and the join condition bounds event-time
    distance — the two things that let Structured Streaming evict buffered
    rows instead of holding both streams forever (state per side ≈
    arrival rate × (watermark + within)).  ``how`` extends to
    ``left_outer``/``right_outer``/``full_outer``: null-padded rows for a
    buffered input emit once the watermark passes its eviction time (i.e.
    on a LATER micro-batch — an unmatched row can't be declared unmatched
    until no future input could still join it).  Batch DataFrames run the
    same plan (duality: identical condition, no state).  Output columns
    are key, l_ts/r_ts, and both values."""
    l = left.select(
        F.col(key), F.col("ts").alias("l_ts"), F.col("value").alias("l_value")
    )
    r = right.select(
        F.col(key).alias("__rk"), F.col("ts").alias("r_ts"), F.col("value").alias("r_value")
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (F.col(key) == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") < F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    # coalesce the key across sides: an unmatched RIGHT row in the outer
    # modes has a NULL left key, and its real key lives in __rk
    return l.join(r, cond, how).select(
        F.coalesce(F.col(key), F.col("__rk")).alias(key),
        "l_ts",
        "r_ts",
        "l_value",
        "r_value",
    )


def stream_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, query_name: str
):
    """File sink with exactly-once semantics via the checkpoint +
    write-ahead commit log (the production landing-zone writer; the
    reference's TupleSender/console sinks map to format('console'))."""
    return (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, timeout_sec: int = 60
):
    """Drive a streaming aggregation to completion against the finite file
    source and return the in-memory result table (test harness helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
