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


def test_stream_static_enrichment_join(spark):
    """Stream-static join: streamed events enriched with a per-user dim;
    result equals the batch join."""
    from pyspark.sql import functions as F

    from maple_spark.catalog import load_table
    from maple_spark.streaming.events import enrich_stream, read_events_stream

    batch_events = load_table(spark, SF_DIR, "events")
    user_dim = (
        batch_events.groupBy("user_id")
        .agg(F.min("ts").alias("first_seen"))
    )
    stream = enrich_stream(
        read_events_stream(spark, SF_DIR), user_dim
    ).select("event_id", "user_id", "first_seen")
    q = (
        stream.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = rows(spark.sql("SELECT * FROM enriched"))
    want = rows(
        enrich_stream(batch_events, user_dim).select(
            "event_id", "user_id", "first_seen"
        )
    )
    assert got == want


def test_stream_parquet_sink_exactly_once(spark, tmp_path_factory):
    """File sink: all source rows land exactly once in the output dir."""
    from maple_spark.catalog import load_table
    from maple_spark.streaming.events import read_events_stream, stream_to_parquet

    out = str(tmp_path_factory.mktemp("stream_out"))
    ckpt = str(tmp_path_factory.mktemp("stream_ckpt"))
    q = stream_to_parquet(
        read_events_stream(spark, SF_DIR).select("event_id", "event_type"),
        out,
        ckpt,
        "sink_test",
    )
    q.awaitTermination(120)
    q.stop()
    written = spark.read.parquet(out)
    src = load_table(spark, SF_DIR, "events")
    assert written.count() == src.count()
    assert written.select("event_id").distinct().count() == src.count()


def test_watermark_drops_late_data(spark, tmp_path_factory):
    """Watermark semantics with real micro-batches: a second file whose
    rows are older than (max event time − delay) is dropped from an
    append-mode windowed aggregation; a within-delay late row is merged."""
    from datetime import datetime

    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("late_events"))
    ts = lambda s: datetime.fromisoformat(s)
    schema = "event_id long, ts timestamp, value double"
    batch1 = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:05:00"), 1.0),
            (2, ts("2024-01-01 13:00:00"), 1.0),  # advances watermark to 11:00
        ],
        schema,
    )
    # watermark propagation lags one micro-batch (it is committed after a
    # batch and applied from the next), so the late row goes in file 3
    batch2 = spark.createDataFrame([(3, ts("2024-01-01 12:10:00"), 1.0)], schema)
    batch3 = spark.createDataFrame(
        [
            (4, ts("2024-01-01 07:10:00"), 1.0),   # window end 08:00 < 11:00 → dropped
            (5, ts("2024-01-01 12:30:00"), 1.0),   # fresh → kept
        ],
        schema,
    )
    import time as _time

    batch1.coalesce(1).write.parquet(f"{d}/f1")
    _time.sleep(1.1)
    batch2.coalesce(1).write.parquet(f"{d}/f2")
    _time.sleep(1.1)
    batch3.coalesce(1).write.parquet(f"{d}/f3")

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        r["ws"].isoformat(): r["n"]
        for r in spark.sql("SELECT * FROM late_test").collect()
    }
    # append mode emits only windows finalized by the watermark (end ≤ 11:00):
    # the 10:00 window with its one on-time event; the very-late event 4
    # (07:00 window, long finalized) must have been dropped, not emitted.
    assert got.get("2024-01-01T10:00:00") == 1
    assert "2024-01-01T07:00:00" not in got


def test_rocksdb_state_store_provider(spark):
    """The 100 TB state backend: the same windowed aggregation runs under
    the RocksDB state store provider (state off-heap/on-disk, not JVM
    hashmaps) and produces the batch answer.  On a real cluster this is
    the difference between OOM and steady state once keyed state exceeds
    executor memory."""
    from maple_spark.catalog import load_table
    from maple_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        windowed_agg,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = windowed_agg(
            read_events_stream(spark, SF_DIR), "1 hour", watermark="2 hours"
        )
        q = run_stream_to_memory(stream, "win_agg_rocksdb", timeout_sec=120)
        got = rows(spark.sql("SELECT * FROM win_agg_rocksdb"))
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    want = rows(windowed_agg(load_table(spark, SF_DIR, "events"), "1 hour"))
    assert got == want


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


def test_stream_dedup_drops_replayed_events(spark, tmp_path_factory):
    """At-least-once → exactly-once: a replayed micro-batch (same
    event_ids) is suppressed by dropDuplicatesWithinWatermark; distinct
    ids all survive."""
    from datetime import datetime

    from maple_spark.streaming.events import dedup_stream

    d = str(tmp_path_factory.mktemp("replay_events"))
    ts = lambda s: datetime.fromisoformat(s)
    schema = "event_id long, ts timestamp, value double"
    batch1 = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 1.0), (2, ts("2024-01-01 10:01:00"), 2.0)],
        schema,
    )
    # replay of event 2 (producer retry) + one new event
    batch2 = spark.createDataFrame(
        [(2, ts("2024-01-01 10:01:00"), 2.0), (3, ts("2024-01-01 10:02:00"), 3.0)],
        schema,
    )
    import time as _time

    batch1.coalesce(1).write.parquet(f"{d}/f1")
    _time.sleep(1.1)
    batch2.coalesce(1).write.parquet(f"{d}/f2")

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
    )
    q = (
        dedup_stream(stream, ["event_id"], watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = sorted(
        (r["event_id"], r["value"])
        for r in spark.sql("SELECT * FROM dedup_test").collect()
    )
    assert got == [(1, 1.0), (2, 2.0), (3, 3.0)]

    # batch path: same operator, same answer
    batch_all = batch1.unionByName(batch2)
    assert sorted(
        (r["event_id"], r["value"])
        for r in dedup_stream(batch_all, ["event_id"]).collect()
    ) == [(1, 1.0), (2, 2.0), (3, 3.0)]


def test_events_fixture_event_ids_unique(spark):
    """st8's oracle equivalence (dropDuplicates on event_id == DISTINCT
    over all columns) depends on the base events table having unique
    event_ids, so the synthetic redelivered copies are byte-identical
    and ANY keeper is deterministic.  Pin the invariant the twin
    depends on — if the fixture generator ever emits two payloads for
    one id, this fails before the driver gate mismatches."""
    from conftest import SF_DIR

    from maple_spark.catalog import load_table

    e = load_table(spark, SF_DIR, "events")
    n, d = e.selectExpr(
        "count(*) AS n", "count(DISTINCT event_id) AS d"
    ).collect()[0]
    assert n == d


def test_stream_stream_join_equals_batch(spark):
    """Stream-stream banded join (watermarked both sides) produces the
    batch answer on the finite fixture — the duality guarantee for the
    hardest stateful operator."""
    from maple_spark.catalog import load_table
    from maple_spark.streaming.events import join_streams, read_events_stream

    batch = load_table(spark, SF_DIR, "events")
    want = rows(join_streams(batch, batch, within="30 minutes"))

    s1 = read_events_stream(spark, SF_DIR)
    s2 = read_events_stream(spark, SF_DIR)
    q = (
        join_streams(s1, s2, within="30 minutes")
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = rows(spark.sql("SELECT * FROM ss_join"))
    assert got == want
    assert len(got) > 0


def test_checkpoint_restart_exactly_once(spark, tmp_path_factory):
    """Exactly-once across restarts: run to completion, add a new source
    file, restart from the same checkpoint — the second run processes ONLY
    the new file (no reprocessing, no loss)."""
    from datetime import datetime

    d = str(tmp_path_factory.mktemp("restart_src"))
    out = str(tmp_path_factory.mktemp("restart_out"))
    ckpt = str(tmp_path_factory.mktemp("restart_ckpt"))
    ts = lambda s: datetime.fromisoformat(s)
    schema = "event_id long, ts timestamp, value double"

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/f*")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 1.0), (2, ts("2024-01-01 10:01:00"), 2.0)],
        schema,
    ).coalesce(1).write.parquet(f"{d}/f1")
    run_once()
    assert spark.read.parquet(out).count() == 2

    spark.createDataFrame(
        [(3, ts("2024-01-01 10:02:00"), 3.0)], schema
    ).coalesce(1).write.parquet(f"{d}/f2")
    run_once()
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]  # each source row exactly once across restarts


def test_transform_with_state_ewma(spark):
    """transformWithStateInPandas (Spark 4 typed-state API): the streamed
    per-user EWMA equals a driver-side recompute over the same events in
    event-time order.  Runs under RocksDB — the API requires the v2 state
    store, which is also the only backend that holds cluster-scale state.

    The API's state-server protocol needs google.protobuf, which this
    container lacks — skipped (not failed) where absent; the operator in
    maple_spark.streaming.stateful is environment-gated the same way."""
    import pytest

    pytest.importorskip(
        "google.protobuf", reason="transformWithState state protocol needs protobuf"
    )

    from maple_spark.catalog import load_table
    from maple_spark.streaming.events import read_events_stream, run_stream_to_memory
    from maple_spark.streaming.stateful import user_ewma_stream

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = user_ewma_stream(read_events_stream(spark, SF_DIR), alpha=0.25)
        # update-mode memory sink (transformWithState is not an aggregation,
        # so the complete-mode helper doesn't apply); the single availableNow
        # batch emits exactly one row per user
        q = (
            stream.writeStream.format("memory")
            .queryName("ewma_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["user_id"]: (r["n_events"], r["ewma_value"])
            for r in spark.sql(
                "SELECT user_id, n_events, ewma_value FROM ewma_tws"
            ).collect()
        }
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    pdf = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts"])
    )
    for user_id, grp in pdf.groupby("user_id"):
        n, ewma = 0, 0.0
        for v in grp["value"]:
            v = float(v)
            ewma = v if n == 0 else 0.25 * v + 0.75 * ewma
            n += 1
        gn, ge = got[user_id]
        assert gn == n
        assert abs(ge - ewma) < 1e-9


def test_stream_stream_left_outer_join_emits_null_padded(spark, tmp_path_factory):
    """Outer stream-stream join: unmatched left rows emit null-padded —
    but only once a LATER micro-batch advances the watermark past their
    eviction time (an unmatched row can't be declared unmatched while
    future input could still join it).  The source is split into two
    time-ordered files so the second batch both advances the watermark
    and closes out batch-1 state.

    Assertions are subset-based on the null-padded rows: which unmatched
    rows emit depends on how far the final watermark advances (rows from
    the last batch stay in state when the query stops)."""
    import datetime as dt

    from maple_spark.streaming.events import join_streams

    d = tmp_path_factory.mktemp("outer_src")
    ts = lambda m: dt.datetime(2024, 1, 1, 0, m)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    )
    # batch 1 (early): user 1 click+purchase (match), user 2 click only
    early = spark.createDataFrame(
        [
            (0, ts(0), 1, "click", 1.0),
            (1, ts(5), 1, "purchase", 10.0),
            (2, ts(0), 2, "click", 2.0),
        ],
        schema,
    )
    # batch 2 (hours later) advances the watermark; batch 3 is the one
    # that runs WITH that advanced watermark and closes out batch-1 state
    # (watermark updates are committed after a batch, applied on the next)
    # the global watermark is the MIN across both inputs, so the late
    # batches must carry clicks AND purchases (for a non-joining user) or
    # the purchase side would pin the watermark at batch 1 forever
    late = spark.createDataFrame(
        [
            (3, dt.datetime(2024, 1, 1, 9, 0), 3, "click", 3.0),
            (13, dt.datetime(2024, 1, 1, 9, 0), 99, "purchase", 0.0),
        ],
        schema,
    )
    later = spark.createDataFrame(
        [
            (4, dt.datetime(2024, 1, 1, 9, 5), 4, "click", 4.0),
            (14, dt.datetime(2024, 1, 1, 9, 6), 98, "purchase", 0.0),
        ],
        schema,
    )
    import time as _time

    # the file source orders batches by modification time — space them out
    early.coalesce(1).write.parquet(str(d / "f1"))
    _time.sleep(1.1)
    late.coalesce(1).write.parquet(str(d / "f2"))
    _time.sleep(1.1)
    later.coalesce(1).write.parquet(str(d / "f3"))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
    )
    clicks = src.where("event_type = 'click'")
    purchases = src.where("event_type = 'purchase'")
    q = (
        join_streams(
            clicks, purchases, within="30 minutes", watermark="1 hour",
            how="left_outer",
        )
        .writeStream.format("memory")
        .queryName("ss_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = [tuple(r) for r in spark.sql("SELECT * FROM ss_outer").collect()]

    matched = [r for r in got if r[2] is not None]
    nulls = [r for r in got if r[2] is None]
    assert matched == [(1, ts(0), ts(5), 1.0, 10.0)]
    # user 2's click from batch 1 must have been closed out once the
    # advanced watermark applied; users 3/4 (late batches) may or may not
    assert (2, ts(0), None, 2.0, None) in nulls
    assert all(r[0] in (2, 3, 4) for r in nulls)


def test_quota_admit_stream_caps_per_key(spark):
    """Streaming per-key admission cap: at most `cap` events per
    event_type pass, chosen in event-time order — and on the finite
    fixture the admitted multiset equals the batch quota_sample by ts
    rank (batch/stream duality for the quota primitive)."""
    from pyspark.sql import functions as F

    from maple_spark.catalog import load_table
    from maple_spark.pipelines.sampling import quota_sample
    from maple_spark.streaming.events import read_events_stream
    from maple_spark.streaming.stateful import quota_admit_stream

    cap = 25
    stream = quota_admit_stream(
        read_events_stream(spark, SF_DIR), key_col="event_type", cap=cap
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("quota_admit")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_type, event_id, ts FROM quota_admit")
    counts = {r["event_type"]: r["n"] for r in
              got.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    q.stop()
    batch = load_table(spark, SF_DIR, "events")
    full = {r["event_type"]: r["n"] for r in
            batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    for k, n_full in full.items():
        assert counts.get(k, 0) == min(cap, n_full), k

    # duality: single-file fixture = one micro-batch, so the admitted set
    # is exactly the batch quota by event-time order
    want = {
        (r["event_type"], r["event_id"])
        for r in quota_sample(batch, "event_type", "ts", cap=cap).collect()
    }
    have = {(r["event_type"], r["event_id"]) for r in
            spark.sql("SELECT event_type, event_id FROM quota_admit").collect()}
    assert have == want


def test_countmin_sketch_streams(spark):
    """The CMS counter table is a plain groupBy-count, so it runs as an
    incremental streaming aggregation unchanged: the sketch built from
    the event stream equals the batch sketch cell-for-cell (the streaming
    frequency-sketch pattern for unbounded firehoses)."""
    from maple_spark.catalog import load_table
    from maple_spark.functions.sketch import countmin_table
    from maple_spark.streaming.events import read_events_stream

    stream_sketch = countmin_table(
        read_events_stream(spark, SF_DIR), "event_type", depth=3, width=256
    )
    q = (
        stream_sketch.writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = rows(spark.sql("SELECT h, bucket, n FROM cms_stream"))
    q.stop()
    want = rows(
        countmin_table(
            load_table(spark, SF_DIR, "events"), "event_type", depth=3, width=256
        )
    )
    assert got == want and len(want) > 0


def test_join_streams_outer_key_coalesced(spark):
    """Unmatched RIGHT rows in the outer modes must keep their key (it
    arrives via the right side's key column, NULL on the left) — batch
    duality makes this directly assertable (review finding, round 4)."""
    import datetime as dt

    from maple_spark.streaming.events import join_streams

    ts = lambda m: dt.datetime(2024, 1, 1, 0, m)
    schema = "user_id long, ts timestamp, value double"
    left = spark.createDataFrame([(1, ts(0), 1.0)], schema)
    right = spark.createDataFrame(
        [(1, ts(5), 10.0), (2, ts(5), 20.0)], schema
    )
    got = {
        (r["user_id"], r["l_value"], r["r_value"])
        for r in join_streams(
            left, right, within="30 minutes", how="full_outer"
        ).collect()
    }
    assert got == {(1, 1.0, 10.0), (2, None, 20.0)}


def test_hll_registers_stream_equals_batch(spark):
    """Windowed-HLL register maintenance (st6): the streaming register
    table is bit-identical to the batch one — max(rho) per (window,
    register) commutes with micro-batching, which is exactly HLL's
    mergeability, and the shared hll_reg_rho expressions make the hash
    math identical by construction."""
    from maple_spark.catalog import load_table
    from maple_spark.streaming.events import (
        hll_registers_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    batch = hll_registers_stream(
        load_table(spark, SF_DIR, "events"), col="user_id", p=8
    )
    stream = hll_registers_stream(
        read_events_stream(spark, SF_DIR), col="user_id", p=8
    )
    q = run_stream_to_memory(stream, "hll_regs_test", timeout_sec=120)
    got = rows(spark.sql("SELECT * FROM hll_regs_test"))
    want = rows(batch)
    q.stop()
    assert got == want and len(want) > 0


def test_cross_dedup_stream_matches_batch(spark, tmp_path_factory):
    """The streaming ingest guard (st7): documents arriving as a file
    stream in two micro-batches are flagged against the static reference
    corpus with EXACTLY the batch operator's output — row-local banding
    is stateless, so candidate generation needs no watermark and the
    only state is the matched-pair dedupe."""
    from maple_spark.catalog import load_table
    from maple_spark.pipelines.dedup import cross_dedup_pairs, cross_dedup_stream

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    new_b = d.where(F.col("doc_id") % 2 == 1)
    ref = d.where(F.col("doc_id") % 2 == 0)
    want = sorted(
        map(tuple, cross_dedup_pairs(
            new_b, ref, "doc_id", "text", jaccard_threshold=0.2).collect())
    )

    import time as _time

    dirp = str(tmp_path_factory.mktemp("cross_dedup_stream"))
    mid = new_b.approxQuantile("doc_id", [0.5], 0.01)[0]
    new_b.where(F.col("doc_id") <= mid).coalesce(1).write.parquet(f"{dirp}/f1")
    _time.sleep(1.1)
    new_b.where(F.col("doc_id") > mid).coalesce(1).write.parquet(f"{dirp}/f2")
    stream = (
        spark.readStream.schema(new_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{dirp}/f*")
    )
    q = (
        cross_dedup_stream(stream, ref, "doc_id", "text", jaccard_threshold=0.2)
        .writeStream.format("memory")
        .queryName("cross_dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM cross_dedup_stream_test").collect())
    )
    assert got == want and len(want) > 0


def test_cross_dedup_stream_snapshot_matches_batch(spark, tmp_path_factory):
    """The AMORTIZED form of st7: the reference tables come from a
    persisted snapshot (build_reference_snapshot) instead of being
    derived in-query, and the guard must still be streaming-legal (the
    snapshot tables are static parquet — stream-static joins, no
    watermark) with EXACTLY the batch operator's output."""
    from maple_spark.catalog import load_table
    from maple_spark.pipelines.dedup import (
        build_reference_snapshot,
        cross_dedup_pairs,
        cross_dedup_stream,
    )

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    new_b = d.where(F.col("doc_id") % 2 == 1)
    ref = d.where(F.col("doc_id") % 2 == 0)
    want = sorted(
        map(tuple, cross_dedup_pairs(
            new_b, ref, "doc_id", "text", jaccard_threshold=0.2).collect())
    )
    snap = str(tmp_path_factory.mktemp("ref_snapshot"))
    build_reference_snapshot(ref, snap, "doc_id", "text")

    dirp = str(tmp_path_factory.mktemp("cross_dedup_snap_stream"))
    new_b.coalesce(1).write.parquet(f"{dirp}/f1")
    stream = (
        spark.readStream.schema(new_b.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{dirp}/f*")
    )
    q = (
        cross_dedup_stream(
            stream, None, "doc_id", "text",
            jaccard_threshold=0.2, reference_snapshot=snap,
        )
        .writeStream.format("memory")
        .queryName("cross_dedup_snap_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    got = sorted(
        map(
            tuple,
            spark.sql("SELECT * FROM cross_dedup_snap_stream_test").collect(),
        )
    )
    assert got == want and len(want) > 0


def test_lm_gate_stream_zero_state_equality(spark, tmp_path):
    """The perplexity ingest gate (round 11): lm_score against a
    persisted LM snapshot is batch-LOCAL (each doc scores against the
    static vocab — no cross-row, cross-batch state), so the streaming
    binding is a zero-state foreachBatch.  Feed the same docs as 3
    file micro-batches and as one batch; the gated outputs must be
    identical, and every micro-batch's scores must come from the SAME
    frozen snapshot (the amortization contract: ingest never refits
    the LM)."""
    from maple_spark.pipelines import textstats

    train = spark.createDataFrame(
        [(100, "a b c a b"), (101, "b a b")], "doc_id long, text string"
    )
    snap = str(tmp_path / "lm_snap")
    textstats.build_lm_snapshot(train, snap)

    rows = [
        (1, "a b a"),
        (2, "a zzz b"),   # OOV token must survive the gate identically
        (3, "c c c"),
        (4, None),
        (5, "b a"),
        (6, ""),
    ]
    d = str(tmp_path / "docs")
    for i in range(3):
        spark.createDataFrame(
            rows[2 * i : 2 * i + 2], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{d}/f{i}")

    batch_all = spark.createDataFrame(rows, "doc_id long, text string")
    expect = sorted(
        map(tuple, textstats.lm_score(batch_all, snap).collect())
    )

    got = []
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _epoch: got.extend(
                textstats.lm_score(b, snap).collect()
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    assert sorted(map(tuple, got)) == expect
    # the OOV doc really backed off (n_oov=1) and NULL text passed
    # through as NULL — the bpe2 contract holds on the stream path too
    by_id = {t[0]: t for t in got}
    assert by_id[2][2] == 1
    assert by_id[4][1:] == (None, None, None)


def test_gopher_gate_stream_zero_state_equality(spark, tmp_path):
    """The gopher gate (t24, round 12) is row-local — no cross-row
    state at all — so its streaming binding is the same zero-state
    foreachBatch as the LM gate's, and the FIRST stage of an
    incremental ingest (cp6's ordering) can run on the stream path
    unchanged.  Same docs as 3 file micro-batches vs one batch must
    gate identically, including the NULL/empty rows (keep=false both
    ways)."""
    from maple_spark.pipelines.curation import gopher_quality_rules

    rows = [
        (1, "the cat sat of the mat and that have with bee tool"),
        (2, "- a\n- b\n- c\nplain"),
        (3, "first line...\nsecond line..."),
        (4, None),
        (5, "123 456 789 000 111 222 333 444 555 666"),
        (6, ""),
    ]
    d = str(tmp_path / "docs")
    for i in range(3):
        spark.createDataFrame(
            rows[2 * i : 2 * i + 2], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{d}/f{i}")

    batch_all = spark.createDataFrame(rows, "doc_id long, text string")
    expect = sorted(
        map(
            tuple,
            gopher_quality_rules(
                batch_all, min_words=10, min_stop_hits=1
            ).collect(),
        )
    )

    got = []
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _epoch: got.extend(
                gopher_quality_rules(
                    b, min_words=10, min_stop_hits=1
                ).collect()
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    assert sorted(map(tuple, got)) == expect
    by_id = {t[0]: t for t in got}
    assert by_id[1][-1] is True
    assert by_id[4][-1] is False and by_id[4][1] is None
    assert by_id[6][-1] is False


def test_lm_backoff_gate_stream_zero_state_equality(spark, tmp_path):
    """The ORDER-3 snapshot gate streams with the same zero-state
    foreachBatch as the unigram one (round 12): the backoff chain's
    model joins are batch-local reads of the frozen snapshot, so the
    higher-order production gate (t20s/t19s shape) needs no state
    store either.  Same docs as micro-batches vs one batch must score
    identically, including positions that exercise the trigram →
    bigram → unigram backoff and OOV."""
    from maple_spark.pipelines import textstats

    train = spark.createDataFrame(
        [(100, "a b c a b"), (101, "b a b")], "doc_id long, text string"
    )
    snap = str(tmp_path / "lm3_snap")
    textstats.build_lm_snapshot(train, snap, order=3)

    rows = [
        (1, "a b c a"),    # seen trigrams
        (2, "a zzz b a"),  # OOV + backoff through unseen bigrams
        (3, "c c c"),
        (4, None),
        (5, "b a b c"),
        (6, ""),
    ]
    d = str(tmp_path / "docs")
    for i in range(3):
        spark.createDataFrame(
            rows[2 * i : 2 * i + 2], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{d}/f{i}")

    batch_all = spark.createDataFrame(rows, "doc_id long, text string")
    expect = sorted(
        map(tuple, textstats.lm_score(batch_all, snap).collect())
    )

    got = []
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _epoch: got.extend(
                textstats.lm_score(b, snap).collect()
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    assert sorted(map(tuple, got)) == expect
    by_id = {t[0]: t for t in got}
    assert by_id[2][2] == 1          # the OOV token backed off
    assert by_id[4][1:] == (None, None, None)
