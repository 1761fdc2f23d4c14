"""CSV ingest (S5-S7) round-trip tests on the F5 fixture shape
(BigDataGen.java: header-less sorted int-pair CSV)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import rows


def test_csv_to_parquet_roundtrip(spark, tmp_warehouse):
    from maple_spark.sources import csv_to_parquet

    csv_path = f"{tmp_warehouse}/vv.csv"
    with open(csv_path, "w") as f:
        for i in range(1000):
            f.write(f"{i},{i}\n")
    out = csv_to_parquet(
        spark,
        csv_path,
        f"{tmp_warehouse}/vv_parquet",
        schema="a int, b int",
    )
    assert out.count() == 1000
    assert out.schema.simpleString() == "struct<a:int,b:int>"
    assert out.agg(F.sum("a")).collect()[0][0] == 499500


def test_partitioned_write_prunes(spark, tmp_warehouse):
    """Hive-style partitioned layout (the 100 TB directory convention):
    a filter on the partition column prunes at planning time — the scan
    reads only matching directories (PartitionFilters in the plan)."""
    from maple_spark.catalog import load_table
    from maple_spark.plans import explain_str
    from conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = f"{tmp_warehouse}/events_by_day"
    events.write.partitionBy("day").mode("overwrite").parquet(out)

    one_day = spark.read.parquet(out).where(F.col("day") == "2024-01-02")
    plan = explain_str(one_day)
    assert "PartitionFilters" in plan and "day" in plan
    # pruned read returns exactly that day's rows
    want = events.where(F.col("day") == "2024-01-02").count()
    assert one_day.count() == want > 0


def test_zorder_layout_prunes_both_columns(spark, tmp_warehouse):
    """Z-order vs single-column sort: per-file min/max spans must be
    narrow on BOTH z-columns (single-column sort leaves the second column
    spanning nearly the full domain in every file → no pruning)."""
    import pyarrow.dataset as ds

    from maple_spark.sources.layout import zorder_write

    import random

    rnd = random.Random(7)
    n = 20000
    df = spark.createDataFrame(
        [(rnd.randint(0, 9999), rnd.randint(0, 9999)) for _ in range(n)],
        "x int, y int",
    )

    def span_fraction(path, col_index):
        frags = list(ds.dataset(path, format="parquet").get_fragments())
        spans = []
        for fr in frags:
            st = fr.metadata.row_group(0).column(col_index).statistics
            spans.append((st.max - st.min) / 9999.0)
        return sum(spans) / len(spans)

    # baseline: sort by x only
    xsort = f"{tmp_warehouse}/xsort"
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(xsort)
    # z-order on (x, y): 16 files = 4 z-prefix bits = 2 bits per dimension,
    # so each file covers ~1/4 of each domain
    zpath = f"{tmp_warehouse}/zorder"
    out = zorder_write(df, zpath, ["x", "y"], n_files=16, bits=10)
    assert out.count() == n

    x_span_sorted = span_fraction(xsort, 0)
    y_span_sorted = span_fraction(xsort, 1)
    x_span_z = span_fraction(zpath, 0)
    y_span_z = span_fraction(zpath, 1)
    assert x_span_sorted < 0.2          # x-sort: x prunes well...
    assert y_span_sorted > 0.9          # ...but y spans everything
    assert x_span_z < 0.7 and y_span_z < 0.7  # z-order: both prune
    # and the combined pruning power beats the single-column layout
    assert x_span_z + y_span_z < x_span_sorted + y_span_sorted


def test_csv_to_parquet_sorted_layout(spark, tmp_warehouse):
    """sort_by gives range-partitioned files → tight parquet min/max stats
    (the analyze-then-encode write path of the reference column store)."""
    from maple_spark.sources import csv_to_parquet

    csv_path = f"{tmp_warehouse}/shuffled.csv"
    import random

    rnd = random.Random(42)
    vals = list(range(2000))
    rnd.shuffle(vals)
    with open(csv_path, "w") as f:
        for v in vals:
            f.write(f"{v},{v % 7}\n")
    out = csv_to_parquet(
        spark,
        csv_path,
        f"{tmp_warehouse}/sorted_parquet",
        schema="k int, g int",
        sort_by=["k"],
        partitions=4,
    )
    assert out.count() == 2000
    # key-range pruning works: a narrow filter reads a subset of files
    import pyarrow.dataset as ds

    frags = list(ds.dataset(f"{tmp_warehouse}/sorted_parquet", format="parquet").get_fragments())
    assert len(frags) == 4
    mins = []
    for fr in frags:
        md = fr.metadata.row_group(0).column(0).statistics
        mins.append((md.min, md.max))
    spans = sorted(mins)
    # ranges are disjoint (sorted layout), so min/max stats can prune
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_jsonl_ingest_with_corrupt_records(spark, tmp_warehouse, tmp_path):
    """Web-corpus ingest: valid JSONL lines roundtrip; malformed lines are
    quarantined (dropped from the Parquet output), never fail the job."""
    from maple_spark.sources import jsonl_to_parquet

    p = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en"}',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
        'this is not json {{{',
        '{"doc_id": 3, "text": "hola", "lang": "es"}',
    ]
    p.write_text("\n".join(lines) + "\n")
    out = jsonl_to_parquet(
        spark,
        str(p),
        f"{tmp_warehouse}/jsonl_parquet",
        schema="doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in out.collect()}
    assert got == {1: ("hello world", "en"), 2: ("bonjour", "fr"), 3: ("hola", "es")}
    assert "_corrupt_record" not in out.columns


def test_orc_roundtrip_and_pushdown(spark, tmp_warehouse):
    """ORC as a second columnar source/sink (S6 encoding-aware ingest
    applies to any columnar format): values survive the roundtrip and
    predicates still push into the ORC scan (min/max stripe skipping at
    scale, like Parquet row groups)."""
    from maple_spark.catalog import load_table
    from maple_spark.plans import explain_str

    from conftest import SF_DIR, rows

    src = load_table(spark, SF_DIR, "nation")
    path = f"{tmp_warehouse}/nation_orc"
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert rows(back) == rows(src)

    filtered = back.where(F.col("n_nationkey") > 10).select("n_nationkey", "n_name")
    plan = explain_str(filtered, mode="formatted")
    assert "PushedFilters" in plan and "n_nationkey" in plan


def test_python_datasource_batch_deterministic(spark):
    """Custom Python DataSource (S5-S7 extension surface): partitioned
    generation, stable schema, and byte-identical re-reads (each row is a
    pure function of (seed, id) — no coordinated RNG state)."""
    from maple_spark.sources.pyds import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("maple_synth_events")
        .option("n_rows", 300)
        .option("partitions", 4)
        .load()
    )
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    a = rows(df)
    b = rows(
        spark.read.format("maple_synth_events")
        .option("n_rows", 300)
        .option("partitions", 7)  # different split, same rows
        .load()
    )
    assert len(a) == 300 and a == b
    assert df.select("event_id").distinct().count() == 300


def test_python_datasource_stream_drains_offsets(spark):
    """The streaming side of the custom source (Kafka-shaped offsets):
    latestOffset advances by rows_per_batch per trigger (rate limiting —
    the whole stream must NOT arrive as one micro-batch), the union of
    batches is exactly the offset range with no dups/gaps, and replayable
    ranges are what make it exactly-once under recovery."""
    import time

    from maple_spark.sources.pyds import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    stream = (
        spark.readStream.format("maple_synth_events")
        .option("max_rows", 250)
        .option("rows_per_batch", 100)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT count(*) n FROM pyds_stream").collect()[0]["n"] >= 250:
            break
        time.sleep(0.5)
    q.stop()
    got = spark.sql("SELECT event_id FROM pyds_stream").collect()
    ids = sorted(r["event_id"] for r in got)
    assert ids == list(range(250))
    # rate limiting really happened: no micro-batch exceeded rows_per_batch
    batch_sizes = [
        p["numInputRows"] for p in (q.recentProgress or []) if p["numInputRows"]
    ]
    assert batch_sizes and max(batch_sizes) <= 100 and len(batch_sizes) >= 3


def test_python_datasource_batch_empty(spark):
    """n_rows=0 must yield an empty frame with the full schema — the
    zero-partition edge the partitions() guard exists for."""
    from maple_spark.sources.pyds import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    df = spark.read.format("maple_synth_events").option("n_rows", 0).load()
    assert df.count() == 0
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]


def test_python_datasource_stream_checkpoint_recovery(spark, tmp_path):
    """The module's exactly-once claim, executed: a checkpointed stream
    is STOPPED mid-flight and restarted from its checkpoint; because
    offsets name row ranges and ranges regenerate identical rows, the
    restarted query must complete the stream with no duplicates and no
    gaps in the durable (file-sink) output."""
    import time

    from maple_spark.sources.pyds import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start(trigger):
        return (
            spark.readStream.format("maple_synth_events")
            .option("max_rows", 300)
            .option("rows_per_batch", 60)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime=trigger)
            .start()
        )

    def n_out():
        try:
            return spark.read.parquet(out).count()
        except Exception:
            return 0

    # slow trigger for run 1 so the kill reliably lands MID-stream (5
    # batches x 2 s >= 8 s of runway; the poll + parquet count take well
    # under that) — a kill after completion would silently test no
    # recovery at all
    q = start("2 seconds")
    deadline = time.time() + 120
    while time.time() < deadline and n_out() < 60:
        time.sleep(0.2)
    q.stop()  # mid-stream kill (some batches committed, some not served)
    n_mid = n_out()
    assert 0 < n_mid < 300

    q2 = start("200 milliseconds")  # fast drain for the recovery run
    deadline = time.time() + 120
    while time.time() < deadline and n_out() < 300:
        time.sleep(0.5)
    q2.stop()
    ids = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert ids == list(range(300))  # no dups, no gaps, full range


def test_analyze_encoding_partition_parallel_equals_global(spark):
    """The partition-parallel runs/sortedness formulation must agree with
    a straightforward global-window reference on multi-partition input,
    including NULLs and partition-boundary adjacencies."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from maple_spark.sources import analyze_encoding

    rnd = random.Random(7)
    data = [
        (
            i // 37,
            rnd.choice(["a", "b", None]),
            rnd.randint(0, 50) if rnd.random() > 0.1 else None,
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(
        data, "sorted_col int, lowcard string, num int"
    ).repartition(7)
    # freeze the (arbitrary but fixed) post-repartition order so both
    # formulations see the same sequence
    df = df.cache()
    df.count()

    got = {
        r["column"]: (r["n"], r["n_runs"], r["sorted_ratio"])
        for r in analyze_encoding(df).collect()
    }

    with_id = df.withColumn("__rid", F.monotonically_increasing_id())
    w = Window.orderBy("__rid")
    for c in df.columns:
        lagged = with_id.select(F.col(c).alias("v"), F.lag(c).over(w).alias("prev"))
        ref = lagged.agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.when(~F.col("v").eqNullSafe(F.col("prev")), 1).otherwise(0)) + 1).alias(
                "n_runs"
            ),
            F.round(
                F.avg(
                    F.when(
                        F.col("prev").isNull() | (F.col("v") >= F.col("prev")), 1.0
                    ).otherwise(0.0)
                ),
                4,
            ).alias("sorted_ratio"),
        ).collect()[0]
        assert got[c] == (ref["n"], ref["n_runs"], ref["sorted_ratio"]), c
    df.unpersist()


def test_text_lines_ingest(spark, tmp_path):
    """Raw text-lines ingest: content-hash ids are re-run stable, blank
    lines drop, duplicate lines collapse to one document."""
    from maple_spark.sources.ingest import text_to_parquet

    p = tmp_path / "corpus.txt"
    p.write_text("alpha doc\n\nbeta doc\nalpha doc\n")
    out1 = text_to_parquet(spark, str(p), str(tmp_path / "o1"))
    got = {r["text"]: r["doc_id"] for r in out1.collect()}
    assert set(got) == {"alpha doc", "beta doc"}
    out2 = text_to_parquet(spark, str(p), str(tmp_path / "o2"))
    assert {r["doc_id"] for r in out2.collect()} == set(got.values())


def test_zorder_supports_string_and_date_columns(spark, tmp_warehouse):
    """Z-order columns need only be ORDERABLE, not numeric: string/date
    cut points come from a seeded-sample pass (percentile_approx rejects
    them).  Per-file min/max spans must narrow on the string column."""
    import datetime
    import random

    import pyarrow.dataset as ds

    from maple_spark.sources.layout import zorder_write

    rnd = random.Random(11)
    base = datetime.date(2024, 1, 1)
    n = 5000
    df = spark.createDataFrame(
        [
            (
                f"user{rnd.randint(0, 9999):04d}",
                base + datetime.timedelta(days=rnd.randint(0, 364)),
            )
            for _ in range(n)
        ],
        "name string, d date",
    )
    zpath = f"{tmp_warehouse}/zorder_str"
    out = zorder_write(df, zpath, ["name", "d"], n_files=8, bits=8)
    assert out.count() == n
    frags = list(ds.dataset(zpath, format="parquet").get_fragments())
    name_spans = []
    for fr in frags:
        st = fr.metadata.row_group(0).column(0).statistics
        # name domain is user0000..user9999 → span as numeric suffix delta
        name_spans.append((int(st.max[4:]) - int(st.min[4:])) / 9999.0)
    assert sum(name_spans) / len(name_spans) < 0.7


# ----------------------------------------------------------------------
# pyds streaming-offset recovery: the duplicate-replay bug's
# generalization (VERDICT r9 task 6), driven at the PROTOCOL level so a
# restart can be injected at EVERY offset (a real query restart per
# offset would take minutes each; the engine's calls to a
# SimpleDataSourceStreamReader are exactly the three methods below).


def _drive_stream_with_restarts(max_rows, rows_per_batch, seed, n_users=7):
    """Simulate Structured Streaming's SimpleDataSourceStreamReader
    protocol with a CRASH + FRESH READER at every single offset:

    - plan batch: read(start) on the current reader -> (rows, end);
      the engine logs `end` in the offset log, then crashes before
      commit;
    - recovery: a BRAND-NEW reader (restart builds fresh instances —
      the exact hole the old cursor-in-latestOffset design fell into)
      replays the logged range via readBetweenOffsets(start, end);
    - the replay must equal the planned rows byte-for-byte, and the
      stream continues from `end` on the new reader.

    Returns the concatenated emitted rows."""
    from maple_spark.sources.pyds import _StreamReader

    opts = {
        "max_rows": str(max_rows),
        "rows_per_batch": str(rows_per_batch),
        "seed": str(seed),
        "n_users": str(n_users),
    }
    reader = _StreamReader(opts)
    start = reader.initialOffset()
    emitted = []
    guard = 0
    while start["offset"] < max_rows:
        it, end = reader.read(start)
        planned = list(it)
        assert end["offset"] > start["offset"], "offset must advance"
        # crash: a restarted query constructs a FRESH reader and
        # replays the logged-but-uncommitted batch executor-side
        reader = _StreamReader(opts)
        replayed = list(reader.readBetweenOffsets(start, end))
        assert replayed == planned, (start, end)
        emitted.extend(replayed)
        start = end
        guard += 1
        assert guard <= max_rows + 2, "stream failed to terminate"
    return emitted


def test_pyds_restart_at_every_offset_property():
    """Exactly-once under restart at EVERY offset, across batch sizes
    that divide max_rows, don't, and exceed it: the union of replayed
    batches is exactly range(max_rows) — no dups, no gaps — and rows
    are identical to an uninterrupted run (pure (seed, id) functions)."""
    from maple_spark.sources.pyds import _StreamReader, _row

    for max_rows, rpb, seed in [
        (300, 60, 42),   # divides evenly
        (250, 60, 42),   # last batch short
        (1, 1, 0),       # degenerate single row
        (7, 100, 9),     # one oversized batch
        (97, 13, 1234),  # coprime sizes
    ]:
        emitted = _drive_stream_with_restarts(max_rows, rpb, seed)
        ids = [r[0] for r in emitted]
        assert ids == list(range(max_rows)), (max_rows, rpb)
        assert emitted == [_row(seed, g, 7) for g in range(max_rows)]


def test_pyds_replay_arbitrary_committed_subranges():
    """readBetweenOffsets must be exact for ANY committed (start, end)
    pair — recovery can replay multi-batch spans when several batches
    were logged but unprocessed — and concatenating adjacent spans must
    equal the covering span (range-additivity)."""
    from maple_spark.sources.pyds import _StreamReader

    opts = {"max_rows": "200", "rows_per_batch": "50", "seed": "7"}
    r = _StreamReader(opts)
    whole = list(r.readBetweenOffsets({"offset": 0}, {"offset": 200}))
    for a, b in [(0, 50), (50, 125), (125, 200), (0, 200), (30, 31), (199, 200)]:
        span = list(
            _StreamReader(opts).readBetweenOffsets(
                {"offset": a}, {"offset": b}
            )
        )
        assert span == whole[a:b], (a, b)
    # empty span is empty, not an error
    assert list(r.readBetweenOffsets({"offset": 60}, {"offset": 60})) == []


def test_pyds_stream_exhaustion_is_stable():
    """At end-of-stream, read(start) must return an empty batch with a
    NON-advancing offset (max_rows is the cursor ceiling) — a restart
    at the final offset then terminates instead of re-serving rows."""
    from maple_spark.sources.pyds import _StreamReader

    r = _StreamReader({"max_rows": "10", "rows_per_batch": "4", "seed": "3"})
    it, end = r.read({"offset": 10})
    assert list(it) == [] and end == {"offset": 10}
    # and beyond the ceiling (a corrupt/foreign offset) it clamps, never
    # yields phantom rows
    it, end = r.read({"offset": 99})
    assert list(it) == [] and end == {"offset": 99}


def test_convert_table_orc_roundtrip_and_pushdown(spark, tmp_path):
    """Format interchange (round 10): parquet -> ORC keeps values
    byte-identical, Spark pushes predicates into the native ORC reader
    (the same scan-level skipping story as parquet), and the sort-by
    range layout produces stripe-narrow files.  CSV round-trip keeps
    column names via the forced header."""
    import pytest

    from conftest import SF_DIR

    from maple_spark.sources.ingest import convert_table

    src = f"{SF_DIR}/nation.parquet"
    orc = str(tmp_path / "nation_orc")
    back = convert_table(
        spark, src, orc, out_format="orc", sort_by=["n_nationkey"]
    )
    base = spark.read.parquet(src)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, base.collect())
    )
    plan = (
        back.where(F.col("n_nationkey") > 20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(n_nationkey), GreaterThan(n_nationkey,20)]" in plan

    csvd = str(tmp_path / "nation_csv")
    back_csv = convert_table(
        spark, orc, csvd, out_format="csv", in_format="orc"
    )
    assert set(back_csv.columns) == set(base.columns)
    assert back_csv.count() == base.count()

    with pytest.raises(ValueError, match="supports"):
        convert_table(spark, src, str(tmp_path / "x"), out_format="avro")


def test_write_and_reread_preserves_types(spark, tmp_path):
    """Round-trip TYPE fidelity through every interchange format (round
    11, VERDICT r10 task 6): a decimal+date+timestamp slice must come
    back schema-identical and value-identical from parquet/orc (self-
    describing) AND csv/json (schema pinned on re-read — an inferring
    re-read legally drifts decimal->double, date->timestamp, which the
    preserve_schema=False escape hatch demonstrates)."""
    from conftest import SF_DIR

    from maple_spark.sources.ingest import write_and_reread

    base = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
            F.to_date("l_shipdate").alias("ship_date"),
            F.col("l_shipdate").alias("ship_ts"),
            "l_returnflag",
        )
    )
    expect = sorted(map(tuple, base.collect()))
    for fmt in ("parquet", "orc", "csv", "json"):
        back = write_and_reread(spark, base, str(tmp_path / f"li_{fmt}"), fmt)
        assert back.schema == base.schema, fmt
        assert sorted(map(tuple, back.collect())) == expect, fmt
    # the documented lossy mode: inference drifts the types
    inferred = write_and_reread(
        spark, base, str(tmp_path / "li_csv_inf"), "csv", preserve_schema=False
    )
    assert inferred.schema != base.schema
    assert dict(inferred.dtypes)["qty"] == "double"


def test_partitioned_export_layout_and_pruning(spark, tmp_path):
    """partition_by (round 11): Hive-partitioned layout through the
    shared writer — a filter on the partition column must prune whole
    directories at PLANNING time (PartitionFilters on the scan, and the
    pruned scan reads only the matching partition's files), the
    round-trip stays schema- and value-identical (partition-column
    types pinned via the source schema — directory names would
    otherwise re-infer), and it composes with sort_by within each
    partition."""
    import os

    from conftest import SF_DIR

    from maple_spark.sources.ingest import write_and_reread

    base = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .where(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
            "l_returnflag",
            "l_linestatus",
        )
    )
    out = str(tmp_path / "li_part")
    back = write_and_reread(
        spark, base, out, "parquet",
        partition_by=["l_returnflag"], sort_by=["l_orderkey"],
    )
    assert back.schema == base.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, base.collect())
    )
    # one directory per flag value
    flags = {r["l_returnflag"] for r in base.select("l_returnflag").distinct().collect()}
    dirs = {d for d in os.listdir(out) if d.startswith("l_returnflag=")}
    assert dirs == {f"l_returnflag={f}" for f in flags}
    plan = (
        back.where(F.col("l_returnflag") == "R")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # a string partition column whose values LOOK numeric must come
    # back string (inference would widen it to int)
    base2 = spark.createDataFrame(
        [(1, "01"), (2, "02")], "id long, bucket string"
    )
    back2 = write_and_reread(
        spark, base2, str(tmp_path / "numlike"), "parquet",
        partition_by=["bucket"],
    )
    assert dict(back2.dtypes)["bucket"] == "string"
    assert sorted(map(tuple, back2.collect())) == [(1, "01"), (2, "02")]


def test_export_compression_codecs(spark, tmp_path):
    """Per-write codec choice (round 11): zstd parquet for cold
    archives vs the snappy default, gzip csv — the codec must reach
    the files (extension-visible) and round-trips stay value-exact."""
    import os

    from conftest import SF_DIR

    from maple_spark.sources.ingest import write_and_reread

    base = spark.read.parquet(f"{SF_DIR}/region.parquet")
    expect = sorted(map(tuple, base.collect()))
    zp = str(tmp_path / "r_zstd")
    back = write_and_reread(spark, base, zp, "parquet", compression="zstd")
    assert sorted(map(tuple, back.collect())) == expect
    assert any(f.endswith(".zstd.parquet") for f in os.listdir(zp))
    gz = str(tmp_path / "r_gz")
    back2 = write_and_reread(spark, base, gz, "csv", compression="gzip")
    assert sorted(map(tuple, back2.collect())) == expect
    assert any(f.endswith(".csv.gz") for f in os.listdir(gz))
