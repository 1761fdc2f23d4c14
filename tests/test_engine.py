"""Engine facade, DDL/ANALYZE, constraints, and UDF surface tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR, rows


def test_engine_sql_and_table(spark):
    from maple_spark.engine import MapleEngine

    eng = MapleEngine(spark, SF_DIR, tables=("region", "nation"))
    got = eng.sql(
        "SELECT r_name, COUNT(*) AS n FROM nation "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    )
    assert got.count() == 5
    assert eng.table("region").count() == 5


def test_engine_explain_and_analyze(spark):
    from maple_spark.engine import MapleEngine

    eng = MapleEngine(spark, SF_DIR, tables=("region",))
    plan = eng.explain("SELECT r_name FROM region WHERE r_regionkey = 1")
    assert "Scan" in plan
    eng.analyze("region")  # ANALYZE TABLE path (CBO stats)
    stats = eng.table_stats("region")
    assert "statistics" in stats and "rows" in stats["statistics"]


def test_ddl_create_drop_view_roundtrip(spark):
    """CREATE VIEW / DROP (CreateViewCommand is a stub in the reference —
    we implement the declared surface)."""
    from maple_spark.catalog import load_table

    load_table(spark, SF_DIR, "region").createOrReplaceTempView("v_region")
    assert spark.sql("SELECT COUNT(*) FROM v_region").collect()[0][0] == 5
    spark.catalog.dropTempView("v_region")
    assert not spark.catalog.tableExists("v_region")


def test_pk_fk_constraints_hold_on_driver_data(spark):
    from maple_spark.catalog import load_table
    from maple_spark.constraints import (
        STAR_SCHEMA_CONSTRAINTS,
        fk_violations,
        not_null_violations,
        pk_violations,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    # orders/customer PKs hold on the driver data; lineitem's declared
    # TPC-H PK does NOT (synthetic duplicates) — the validator must
    # report violations rather than assume zero.
    assert pk_violations(o, STAR_SCHEMA_CONSTRAINTS["orders"].primary_key).count() == 0
    assert pk_violations(c, STAR_SCHEMA_CONSTRAINTS["customer"].primary_key).count() == 0
    assert pk_violations(li, STAR_SCHEMA_CONSTRAINTS["lineitem"].primary_key).count() > 0
    assert fk_violations(li, ["l_orderkey"], o, ["o_orderkey"]).count() == 0
    assert fk_violations(o, ["o_custkey"], c, ["c_custkey"]).count() == 0


def test_pk_violation_detected(spark):
    from maple_spark.constraints import fk_violations, pk_violations

    dup = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "id int, v string")
    viol = pk_violations(dup, ["id"]).collect()
    assert len(viol) == 1 and viol[0]["n_rows"] == 2
    parent = spark.createDataFrame([(1,)], "id int")
    orphans = fk_violations(dup, ["id"], parent, ["id"])
    assert orphans.count() == 1  # id=2 has no parent


def test_udf_normalize_and_vec_norm(spark):
    from maple_spark.functions.udf import normalize_text, register_all, vec_norm

    df = spark.createDataFrame([("  Hello   WORLD  ",)], "t string")
    assert df.select(normalize_text("t").alias("n")).collect()[0]["n"] == "hello world"
    register_all(spark)
    df.createOrReplaceTempView("udf_t")
    assert (
        spark.sql("SELECT normalize_text(t) AS n FROM udf_t").collect()[0]["n"]
        == "hello world"
    )
    vecs = spark.createDataFrame([([3.0, 4.0],)], "v array<float>")
    assert abs(vecs.select(vec_norm("v").alias("n")).collect()[0]["n"] - 5.0) < 1e-9


def test_grouped_agg_udaf(spark):
    from maple_spark.functions.udf import grouped_sum_udaf

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], "g string, v double")
    got = rows(df.groupBy("g").agg(grouped_sum_udaf("v").alias("s")))
    assert got == [("a", 3.0), ("b", 5.0)]


def test_stateful_user_profile_stream(spark):
    """applyInPandasWithState custom stateful operator: final state equals
    the batch groupBy answer."""
    from maple_spark.catalog import load_table
    from maple_spark.streaming.events import read_events_stream
    from maple_spark.streaming.stateful import user_profile_stream

    stream = user_profile_stream(read_events_stream(spark, SF_DIR))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    # latest emitted row per user == batch aggregate
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql(
            """SELECT user_id, n_events, sum_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) AS rn FROM user_profiles)
               WHERE rn = 1"""
        ).collect()
    }
    batch = load_table(spark, SF_DIR, "events")
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_execute_script_multi_statement(spark):
    """doCommands parity: a multi-statement script (DDL + insert + query)
    executes sequentially with one result slot per statement."""
    from maple_spark.engine import MapleEngine

    from conftest import SF_DIR

    eng = MapleEngine(spark, SF_DIR)
    spark.sql("DROP TABLE IF EXISTS script_t")
    results = eng.execute_script(
        """
        CREATE TABLE script_t (a INT, b STRING) USING parquet;
        INSERT INTO script_t VALUES (1, 'x;y'), (2, 'z');
        SELECT a, b FROM script_t ORDER BY a;
        DROP TABLE script_t
        """
    )
    assert len(results) == 4
    assert [tuple(r) for r in results[2]] == [(1, "x;y"), (2, "z")]


def test_execute_script_caps_result_collection(spark):
    """A script SELECT over a fact table must not collect unbounded rows
    to the driver: results are capped at max_rows (+1 so callers can
    detect truncation) — the REPL's discipline, applied to scripts."""
    from maple_spark.engine import MapleEngine

    from conftest import SF_DIR

    eng = MapleEngine(spark, SF_DIR, tables=("lineitem",))
    (res,) = eng.execute_script("SELECT l_orderkey FROM lineitem", max_rows=50)
    assert len(res) == 51  # truncation marker: one row beyond the cap
    # max_rows=0 restores unbounded collect for known-small results
    (res0,) = eng.execute_script(
        "SELECT l_linestatus FROM lineitem GROUP BY l_linestatus", max_rows=0
    )
    assert len(res0) <= 2


def test_engine_verify_key_uniqueness(spark):
    """VERIFY analog: orders PK is clean; the synthetic lineitem violates
    its TPC-H PK (documented in FIXTURES.md) and verify reports it."""
    from maple_spark.engine import MapleEngine

    from conftest import SF_DIR

    eng = MapleEngine(spark, SF_DIR)
    assert eng.verify("orders", ["o_orderkey"]).count() == 0
    assert eng.verify("lineitem", ["l_orderkey", "l_linenumber"]).count() > 0


def test_tcp_query_server_round_trip(spark):
    """SharedServer parity (SURVEY §3.2): concurrent clients over TCP share
    one engine; results stream back row-limited; errors come back on the
    wire instead of killing the connection."""
    import threading

    from maple_spark.engine import MapleEngine
    from maple_spark.server import QueryServer, query_once

    from conftest import SF_DIR

    engine = MapleEngine(spark, SF_DIR, tables=("region", "nation"))
    server = QueryServer(engine)
    server.start_background()
    try:
        resp = query_once("127.0.0.1", server.port, "SELECT COUNT(*) AS n FROM region")
        assert resp["ok"] and resp["rows"] == [[5]]

        # row-limit streaming: 25 nation rows, limit 10 → truncated
        resp = query_once(
            "127.0.0.1", server.port, "SELECT n_nationkey FROM nation", limit=10
        )
        assert resp["ok"] and len(resp["rows"]) == 10 and resp["truncated"]

        # errors are a response, not a dropped connection
        resp = query_once("127.0.0.1", server.port, "SELECT * FROM no_such_table")
        assert not resp["ok"] and "no_such_table" in resp["error"]

        # two concurrent clients against the shared session
        out = {}

        def go(tag, sql):
            out[tag] = query_once("127.0.0.1", server.port, sql)

        threads = [
            threading.Thread(target=go, args=("a", "SELECT MAX(n_nationkey) AS m FROM nation")),
            threading.Thread(target=go, args=("b", "SELECT COUNT(*) AS n FROM nation")),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(60)
        assert out["a"]["rows"] == [[24]] and out["b"]["rows"] == [[25]]
    finally:
        server.shutdown()
        server.server_close()


def test_repl_loop(spark):
    """§3.1 REPL parity: multi-line buffering, statement execution with
    TuplePrinter-style output, error recovery, EXIT."""
    import io

    from maple_spark.engine import MapleEngine
    from maple_spark.repl import run_repl

    eng = MapleEngine(spark, SF_DIR, tables=("region", "nation"))
    session = (
        "SELECT r_name FROM region\n"          # continuation line (no ';')
        "ORDER BY r_name LIMIT 2;\n"
        "SELECT broken FROM nowhere;\n"        # error must not kill the loop
        "SELECT COUNT(*) AS n FROM nation;\n"
        "EXIT;\n"
        "SELECT 1;\n"                          # never reached
    )
    out = io.StringIO()
    run_repl(eng, io.StringIO(session), out)
    text = out.getvalue()
    assert text.startswith("CMD> ")
    assert "   > " in text                     # continuation prompt shown
    assert "AFRICA" in text and "AMERICA" in text and "(2 rows)" in text
    assert "ERROR:" in text
    assert "25" in text                        # nation count
    assert text.rstrip().endswith("bye")


def test_repl_format_rows_nulls_and_truncation():
    from maple_spark.repl import format_rows

    txt = format_rows(["a", "bb"], [(1, None), (2, "x")])
    lines = txt.splitlines()
    assert lines[0].split(" | ")[0].strip() == "a"
    assert "NULL" in txt and "(2 rows)" in txt
    txt2 = format_rows(["a"], [(i,) for i in range(6)], max_rows=5)
    assert "first 5 shown" in txt2
    assert format_rows(["a"], []).endswith("(0 rows)")


def test_engine_export_formats(spark, tmp_path):
    """engine.export: registered table -> ORC/CSV with value-identical
    round-trip and the format whitelist enforced."""
    import pytest

    from maple_spark.engine import MapleEngine

    engine = MapleEngine(spark, SF_DIR, tables=("region",))
    back = engine.export("region", str(tmp_path / "region_orc"), "orc")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, engine.table("region").collect())
    )
    csv_back = engine.export("region", str(tmp_path / "region_csv"), "csv")
    assert set(csv_back.columns) == set(engine.table("region").columns)
    assert csv_back.count() == engine.table("region").count()
    with pytest.raises(ValueError, match="supports"):
        engine.export("region", str(tmp_path / "x"), "avro")
