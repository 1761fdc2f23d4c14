"""Semantic tests for the time-series / analytic extensions on hand-built
frames (gap-fill, LOCF, sliding windows, pivot, grouping sets).

The DuckDB oracle (scripts/selfcheck.py) proves cross-engine value equality
on the driver tables; these pin the *semantics* on inputs small enough to
reason about by hand — the reference's SqlTestCase style (SURVEY.md §5).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from conftest import SF_DIR, rows

import __spark_entry__ as e


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gapfill_densifies_and_zero_fills(spark, tmp_path):
    """3-hour span with an empty middle hour for one type → the grid emits
    every (hour, type) cell and the empty ones carry n_events = 0."""
    ev = spark.createDataFrame(
        [
            (0, _ts(0, 5), 1, "click", 1.0, "{}"),
            (1, _ts(2, 5), 1, "click", 1.0, "{}"),
            (2, _ts(1, 5), 1, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in e.ts1_gapfill(spark, str(tmp_path)).collect()
    }
    assert len(out) == 6  # 3 hours x 2 types, gaps included
    assert out[("2024-01-01 01:00:00.000000", "click")] == 0
    assert out[("2024-01-01 00:00:00.000000", "click")] == 1
    assert sum(out.values()) == 3


def test_locf_carries_forward_only_within_user(spark, tmp_path):
    ev = spark.createDataFrame(
        [
            (0, _ts(0), 1, "click", 0.0, "{}"),
            (1, _ts(1), 1, "purchase", 9.5, "{}"),
            (2, _ts(2), 1, "click", 0.0, "{}"),
            (3, _ts(3), 2, "click", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r["event_id"]: r["last_purchase_value"]
        for r in e.ts2_locf(spark, str(tmp_path)).collect()
    }
    assert got[0] is None          # before any purchase
    assert got[1] == 9.5           # the purchase row itself
    assert got[2] == 9.5           # carried forward
    assert got[3] is None          # other user: no leakage across partitions


def test_sliding_window_assigns_each_event_to_four_windows(spark):
    """1 h window hopping every 15 min → every event is counted exactly 4
    times, so the window counts total 4× the event count."""
    from maple_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    out = e.st3_sliding_window(spark, SF_DIR)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 4 * ev.count()


def test_sliding_window_starts_on_15_minute_grid(spark):
    out = e.st3_sliding_window(spark, SF_DIR).select("window_start").distinct()
    for (s,) in out.collect():
        minute = int(s[14:16])
        assert minute % 15 == 0 and s.endswith(":00.000000")


def test_pivot_counts_match_groupby(spark):
    from maple_spark.catalog import load_table

    o = load_table(spark, SF_DIR, "orders")
    expected = {
        (r["o_orderpriority"], r["o_orderstatus"]): r["n"]
        for r in o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in e.pv1_pivot(spark, SF_DIR).collect():
        p = r["o_orderpriority"]
        assert r["n_f"] == expected.get((p, "F"), 0)
        assert r["n_o"] == expected.get((p, "O"), 0)
        assert r["n_p"] == expected.get((p, "P"), 0)


def test_grouping_sets_levels_are_consistent(spark):
    """Grand total row == sum of the per-flag rows == sum of the leaf rows;
    grouping flags tag each level."""
    out = e.a9_grouping_sets(spark, SF_DIR).collect()
    leaf = [r for r in out if r["g_flag"] == 0 and r["g_status"] == 0]
    per_flag = [r for r in out if r["g_flag"] == 0 and r["g_status"] == 1]
    grand = [r for r in out if r["g_flag"] == 1 and r["g_status"] == 1]
    assert len(grand) == 1
    assert grand[0]["n"] == sum(r["n"] for r in leaf) == sum(r["n"] for r in per_flag)
    assert abs(grand[0]["sum_qty"] - sum(r["sum_qty"] for r in leaf)) < 1e-6


def test_movavg_frame_is_exact_over_first_rows(spark):
    """The ROWS 3-PRECEDING moving average at row k (k<4) averages exactly
    the first k+1 rows — verified against a driver-side recompute."""
    out = e.w2_window_lead_movavg(spark, SF_DIR)
    one_group = (
        out.where(F.col("o_orderpriority") == "1-URGENT")
        .orderBy("pct_rank", "o_orderkey")
        .limit(4)
        .collect()
    )
    prices = [r["o_totalprice"] for r in one_group]
    for k, r in enumerate(one_group):
        window = prices[max(0, k - 3) : k + 1]
        assert abs(r["movavg4"] - sum(window) / len(window)) < 1e-6
