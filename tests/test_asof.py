"""As-of / range join operator tests (hand-computed fixtures)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from conftest import rows


def _ts(s):
    return datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),
            (2, 100, _ts("2024-01-01 12:00:00")),
            (3, 200, _ts("2024-01-01 11:00:00")),
            (4, 300, _ts("2024-01-01 09:00:00")),  # key with no right rows
        ],
        "id long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 09:30:00"), 1.0),
            (100, _ts("2024-01-01 11:30:00"), 2.0),
            (200, _ts("2024-01-01 11:00:00"), 9.0),  # exactly equal time
            (200, _ts("2024-01-01 11:30:00"), 10.0),  # after left → invisible
        ],
        "k long, t timestamp, v double",
    )
    return left, right


def test_as_of_join_basic(spark):
    from maple_spark.operators.asof import as_of_join

    left, right = _fixture(spark)
    got = {
        r["id"]: r["v"]
        for r in as_of_join(left, right, "k", "t", "t", ["v"]).collect()
    }
    assert got == {
        1: 1.0,   # 10:00 sees 09:30
        2: 2.0,   # 12:00 sees 11:30
        3: 9.0,   # equal timestamp matches (ASOF convention)
        4: None,  # no right rows for key 300
    }


def test_as_of_join_tolerance(spark):
    from maple_spark.operators.asof import as_of_join

    left, right = _fixture(spark)
    got = {
        r["id"]: r["v"]
        for r in as_of_join(
            left, right, "k", "t", "t", ["v"], tolerance="45 MINUTES"
        ).collect()
    }
    # id=1: 09:30 within 45min of 10:00 → match; id=2: 11:30 within 45min
    # of 12:00 → match; same as basic here but a stale right row is dropped:
    assert got[1] == 1.0 and got[2] == 2.0 and got[3] == 9.0 and got[4] is None
    # shrink tolerance: 10 minutes → id=1's 09:30 purchase is too old
    got10 = {
        r["id"]: r["v"]
        for r in as_of_join(
            left, right, "k", "t", "t", ["v"], tolerance="10 MINUTES"
        ).collect()
    }
    assert got10[1] is None and got10[3] == 9.0


def test_as_of_join_matches_duckdb(spark):
    """Cross-engine: the union+window formulation equals DuckDB ASOF JOIN
    on the events table."""
    import duckdb

    from conftest import SF_DIR
    from maple_spark.catalog import load_table
    from maple_spark.operators.asof import as_of_join

    e = load_table(spark, SF_DIR, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    got = sorted(
        (r["event_id"], r["pv"])
        for r in as_of_join(clicks, purchases, "user_id", "ts", "ts", ["pv"]).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                """
        SELECT c.event_id, p.pv
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='click') c
        ASOF LEFT JOIN (SELECT user_id, ts, value AS pv FROM events
                        WHERE event_type='purchase') p
        ON c.user_id = p.user_id AND c.ts >= p.ts
        """
            ).fetchall(),
        )
    )
    assert got == want


def test_range_join_tiers(spark):
    from maple_spark.operators.asof import range_join

    fact = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, -1.0)], "id long, v double")
    bands = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 20.0)], "tier string, lo double, hi double"
    )
    got = rows(range_join(fact, bands, "v").select("id", "tier"))
    assert got == [(1, "a"), (2, "b"), (3, None)]


def test_asof_latest_row_wins_even_with_null_payload(spark):
    """The matched right row must be taken WHOLE: a NULL in the latest
    right row's payload stays NULL — per-column carry would smuggle in a
    stale value from an older right row (review finding, round 4)."""
    from maple_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 3)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 1, 1.0, 2.0), (1, 2, None, 3.0)], "k int, t int, a double, b double"
    )
    got = as_of_join(left, right, key="k", left_time="t", right_time="t").collect()
    assert len(got) == 1
    r = got[0]
    assert r["a"] is None and r["b"] == 3.0


def test_interval_overlap_join_matches_naive(spark):
    """Binned interval-overlap join equals the naive theta-join
    formulation on crafted intervals: nested, disjoint, touching at a
    single instant (closed-interval semantics), spanning many bins, and
    zero-length instants."""
    from pyspark.sql import functions as F

    from maple_spark.operators.asof import interval_overlap_join

    def ts(h, m=0, s=0):
        return f"2024-03-01 {h:02d}:{m:02d}:{s:02d}"

    rows_a = [
        (1, ts(0), ts(5)),          # spans 6 hourly bins
        (2, ts(6), ts(6)),          # instant
        (3, ts(7), ts(8)),
        (4, ts(10, 30), ts(11, 30)),
    ]
    rows_b = [
        (10, ts(1), ts(2)),         # nested in a1
        (20, ts(5), ts(6)),         # touches a1 at 05:00, a2 at 06:00
        (30, ts(8), ts(9)),         # touches a3 at 08:00
        (40, ts(12), ts(13)),       # disjoint from everything
    ]
    a = spark.createDataFrame(rows_a, "aid int, a0s string, a1s string").select(
        "aid", F.col("a0s").cast("timestamp").alias("a0"),
        F.col("a1s").cast("timestamp").alias("a1"),
    )
    b = spark.createDataFrame(rows_b, "bid int, b0s string, b1s string").select(
        "bid", F.col("b0s").cast("timestamp").alias("b0"),
        F.col("b1s").cast("timestamp").alias("b1"),
    )
    got = sorted(
        (r["aid"], r["bid"])
        for r in interval_overlap_join(a, b, "a0", "a1", "b0", "b1").collect()
    )
    want = sorted(
        (r["aid"], r["bid"])
        for r in a.crossJoin(b)
        .where((F.col("a0") <= F.col("b1")) & (F.col("b0") <= F.col("a1")))
        .collect()
    )
    assert got == want
    assert (1, 10) in got and (1, 20) in got      # nested + touching
    assert (2, 20) in got and (3, 30) in got      # instant + boundary
    assert all(bid != 40 for _, bid in got)        # disjoint excluded

    # bag semantics: duplicate input rows keep theta-join multiplicity
    # (the dedup is the first-shared-bin filter, not a distinct)
    a2 = a.unionByName(a.where(F.col("aid") == 3))   # aid 3 twice
    got2 = sorted(
        (r["aid"], r["bid"])
        for r in interval_overlap_join(a2, b, "a0", "a1", "b0", "b1").collect()
    )
    assert got2.count((3, 30)) == 2
