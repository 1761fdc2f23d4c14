"""Reference test-fixture parity: the reference's own SQL tests, replayed
verbatim through MapleEngine with the reference's literal expected rows.

Sources (each test cites its method):
- src/test/java/com/bow/maple/sql/TestSimpleSelects.java
- src/test/java/com/bow/maple/sql/TestSelectProject.java
- src/test/java/com/bow/maple/sql/test_sql.props        (setup fixtures)
- src/test/java/com/bow/maple/expressions/TestArithmeticOperator.java
- src/test/java/com/bow/maple/expressions/TestBooleanOperator.java
- src/test/java/com/bow/maple/expressions/TestTypeConverter.java
- src/test/java/com/bow/maple/types/TestTime.java

checkUnorderedResults (SqlTestCase.java:164) = multiset compare ignoring
row order; checkOrderedResults (SqlTestCase.java:223) = exact list
compare.  Setup scripts run through execute_script exactly as
SqlTestCase runs them through NanoDBServer.doCommand.
"""

from __future__ import annotations

import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from maple_spark.engine import MapleEngine

    return MapleEngine(
        spark, SF_DIR, warehouse=str(tmp_path_factory.mktemp("ref_parity"))
    )


def run_unordered(engine, sql):
    """checkUnorderedResults: result rows as a sorted multiset."""
    rows = engine.execute_script(sql)[-1]
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((x is not None, str(x)) for x in t),
    )


def as_multiset(expected):
    return sorted(
        expected, key=lambda t: tuple((x is not None, str(x)) for x in t)
    )


# --- test_sql.props fixtures, verbatim (line-continuations joined) --------

SETUP_SIMPLE_SELECTS = """
    DROP TABLE IF EXISTS test_simple_selects;
    CREATE TABLE test_simple_selects ( a INTEGER, b INTEGER );
    INSERT INTO test_simple_selects VALUES ( 0, NULL );
    INSERT INTO test_simple_selects VALUES ( 1, 10 );
    INSERT INTO test_simple_selects VALUES ( 2, 20 );
    INSERT INTO test_simple_selects VALUES ( 3, 30 );
    INSERT INTO test_simple_selects VALUES ( 4, NULL );
"""

SETUP_SELECT_PROJECT = """
    DROP TABLE IF EXISTS test_select_project;
    CREATE TABLE test_select_project ( a INTEGER, b VARCHAR(20), c INTEGER );
    INSERT INTO test_select_project VALUES ( 1,    'red',   10 );
    INSERT INTO test_select_project VALUES ( 2, 'orange',   20 );
    INSERT INTO test_select_project VALUES ( 3,     NULL,   30 );
    INSERT INTO test_select_project VALUES ( 4,  'green', NULL );
    INSERT INTO test_select_project VALUES ( 5, 'yellow',   40 );
    INSERT INTO test_select_project VALUES ( 6,   'blue',   50 );
"""


def _clear_stale_location(spark, name):
    """A crashed earlier run can leave the managed-table directory behind
    with no catalog entry; DROP TABLE then can't clean it and CREATE
    refuses the location.  Same recovery engine.analyze does."""
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:"):
        shutil.rmtree(
            warehouse.removeprefix("file:") + f"/{name}", ignore_errors=True
        )


@pytest.fixture(scope="module")
def simple_selects(engine):
    engine.spark.sql("DROP TABLE IF EXISTS test_simple_selects")
    _clear_stale_location(engine.spark, "test_simple_selects")
    engine.execute_script(SETUP_SIMPLE_SELECTS)
    return engine


@pytest.fixture(scope="module")
def select_project(engine):
    engine.spark.sql("DROP TABLE IF EXISTS test_select_project")
    _clear_stale_location(engine.spark, "test_select_project")
    engine.execute_script(SETUP_SELECT_PROJECT)
    return engine


def test_select_no_predicate(simple_selects):
    """TestSimpleSelects.testSelectNoPredicate (TestSimpleSelects.java:30-42)."""
    got = run_unordered(simple_selects, "SELECT * FROM test_simple_selects")
    assert got == as_multiset([(0, None), (1, 10), (2, 20), (3, 30), (4, None)])


@pytest.mark.parametrize(
    "query,expected",
    [
        ("SELECT * FROM test_simple_selects WHERE b < 25", [(1, 10), (2, 20)]),
        ("SELECT * FROM test_simple_selects WHERE b > 15", [(2, 20), (3, 30)]),
        ("SELECT * FROM test_simple_selects WHERE b > 15 AND b < 25", [(2, 20)]),
    ],
)
def test_select_simple_predicates(simple_selects, query, expected):
    """TestSimpleSelects.testSelectSimplePredicates
    (TestSimpleSelects.java:51-81) — NULL b rows never match (3VL)."""
    assert run_unordered(simple_selects, query) == as_multiset(expected)


@pytest.mark.parametrize(
    "query,expected",
    [
        (
            "SELECT c, a FROM test_select_project",
            [(10, 1), (20, 2), (30, 3), (None, 4), (40, 5), (50, 6)],
        ),
        (
            "SELECT c, b FROM test_select_project",
            [
                (10, "red"), (20, "orange"), (30, None),
                (None, "green"), (40, "yellow"), (50, "blue"),
            ],
        ),
    ],
)
def test_project_reorder_cols(select_project, query, expected):
    """TestSelectProject.testProjectReorderCols (TestSelectProject.java:28-58)."""
    assert run_unordered(select_project, query) == as_multiset(expected)


def test_project_math(select_project):
    """TestSelectProject.testProjectMath (TestSelectProject.java:66-83):
    arithmetic over columns, NULL propagates."""
    got = run_unordered(
        select_project,
        "SELECT a - 10 AS am, c * 3 AS cm FROM test_select_project",
    )
    assert got == as_multiset(
        [(-9, 30), (-8, 60), (-7, 90), (-6, None), (-5, 120), (-4, 150)]
    )


def test_select_project_math(select_project):
    """TestSelectProject.testSelectProjectMath (TestSelectProject.java:92-107)."""
    got = run_unordered(
        select_project,
        "SELECT b, a - 10 AS am, c * 3 AS cm FROM test_select_project "
        "WHERE a > 2 AND c < 45",
    )
    assert got == as_multiset([(None, -7, 90), ("yellow", -5, 120)])


# --- TestArithmeticOperator.java: the numeric-promotion ladder ------------
#
# Each case is (left SQL literal, op, right SQL literal, expected value,
# expected Spark result type).  The reference's coercion rules
# (TestArithmeticOperator.java:37-123): int∘int→int, long∘long→long,
# float∘float→float, double∘double→double, int∘long→long, int∘double→double,
# long∘double→double, double∘float→double.  DOCUMENTED DIVERGENCE: the
# reference types int∘float and long∘float as FLOAT; Spark widens them to
# DOUBLE (int/long don't fit float losslessly) — values still agree, so the
# cases below assert the reference VALUES with Spark's (safer) result type.

def _i(v):  # INTEGER literal
    return f"CAST({v} AS INT)"


def _l(v):  # BIGINT literal
    return f"CAST({v} AS BIGINT)"


def _f(v):  # FLOAT literal
    return f"CAST({v} AS FLOAT)"


def _d(v):  # DOUBLE literal
    return f"CAST({v} AS DOUBLE)"


ARITH_CASES = [
    # ADD_TESTS (TestArithmeticOperator.java:37-62)
    (_i(3), "+", _i(4), 7, "int"),
    (_f(2.5), "+", _f(3.25), 5.75, "float"),
    (_l(14), "+", _l(38), 52, "bigint"),
    (_d(-3.5), "+", _d(9.0), 5.5, "double"),
    (_i(3), "+", _f(4.5), 7.5, "double"),
    (_f(2.5), "+", _i(4), 6.5, "double"),
    (_l(3), "+", _f(4.5), 7.5, "double"),
    (_f(2.5), "+", _l(4), 6.5, "double"),
    (_i(3), "+", _l(15), 18, "bigint"),
    (_l(12), "+", _i(4), 16, "bigint"),
    (_i(3), "+", _d(4.5), 7.5, "double"),
    (_d(2.5), "+", _i(4), 6.5, "double"),
    (_l(3), "+", _d(4.5), 7.5, "double"),
    (_d(2.5), "+", _l(4), 6.5, "double"),
    (_d(3.5), "+", _f(4.75), 8.25, "double"),
    (_f(2.5), "+", _d(1.25), 3.75, "double"),
    # SUB_TESTS (TestArithmeticOperator.java:66-94)
    (_i(3), "-", _i(4), -1, "int"),
    (_f(2.5), "-", _f(3.25), -0.75, "float"),
    (_l(14), "-", _l(38), -24, "bigint"),
    (_d(-3.5), "-", _d(9.0), -12.5, "double"),
    (_i(3), "-", _f(4.5), -1.5, "double"),
    (_f(2.5), "-", _i(4), -1.5, "double"),
    (_l(3), "-", _f(4.5), -1.5, "double"),
    (_f(2.5), "-", _l(4), -1.5, "double"),
    (_i(3), "-", _l(15), -12, "bigint"),
    (_l(12), "-", _i(4), 8, "bigint"),
    (_i(3), "-", _d(4.5), -1.5, "double"),
    (_d(2.5), "-", _i(4), -1.5, "double"),
    (_l(3), "-", _d(4.5), -1.5, "double"),
    (_d(2.5), "-", _l(4), -1.5, "double"),
    (_d(3.5), "-", _f(4.75), -1.25, "double"),
    (_f(2.5), "-", _d(1.25), 1.25, "double"),
    # MUL_TESTS (TestArithmeticOperator.java:98-123)
    (_i(3), "*", _i(4), 12, "int"),
    (_f(2.5), "*", _f(3.25), 8.125, "float"),
    (_l(14), "*", _l(38), 532, "bigint"),
    (_d(-3.5), "*", _d(9.0), -31.5, "double"),
    (_i(3), "*", _f(4.5), 13.5, "double"),
    (_f(2.5), "*", _i(4), 10.0, "double"),
    (_l(3), "*", _f(4.5), 13.5, "double"),
    (_f(2.5), "*", _l(4), 10.0, "double"),
    (_i(3), "*", _l(15), 45, "bigint"),
    (_l(12), "*", _i(4), 48, "bigint"),
    (_i(3), "*", _d(4.5), 13.5, "double"),
    (_d(2.5), "*", _i(4), 10.0, "double"),
    (_l(3), "*", _d(4.5), 13.5, "double"),
    (_d(2.5), "*", _l(4), 10.0, "double"),
    (_d(3.5), "*", _f(4.75), 16.625, "double"),
    (_f(2.5), "*", _d(1.25), 3.125, "double"),
]


def test_arithmetic_promotion_ladder(spark):
    """TestArithmeticOperator ADD/SUB/MUL tables: result value AND result
    type must follow the reference's promotion ladder.  One SELECT with
    all 48 expressions (one pass, not 48 jobs)."""
    exprs = [
        f"({lhs} {op} {rhs}) AS r{i}"
        for i, (lhs, op, rhs, _, _) in enumerate(ARITH_CASES)
    ]
    df = spark.sql("SELECT " + ", ".join(exprs))
    row = df.collect()[0]
    for i, (lhs, op, rhs, want_val, want_type) in enumerate(ARITH_CASES):
        got_type = df.schema[f"r{i}"].dataType.simpleString()
        assert got_type == want_type, f"{lhs} {op} {rhs}: type {got_type} != {want_type}"
        got = row[f"r{i}"]
        assert got == pytest.approx(want_val), f"{lhs} {op} {rhs}: {got} != {want_val}"


# --- TestBooleanOperator.java: AND/OR/NOT truth values --------------------

@pytest.mark.parametrize(
    "expr,expected",
    [
        # testAndOper (TestBooleanOperator.java:48-85)
        ("true AND true AND true", True),
        ("true AND false AND false", False),
        ("false AND true AND true", False),
        # testOrOper (TestBooleanOperator.java:89-126)
        ("false OR false OR false", False),
        ("false OR true OR false", True),
        ("true OR false OR false", True),
        # testNotOper (TestBooleanOperator.java:130-139)
        ("NOT true", False),
        ("NOT false", True),
    ],
)
def test_boolean_operator_truth_values(spark, expr, expected):
    """TestBooleanOperator truth tables.  (The reference also asserts
    short-circuit evaluation order via EvalTracker — an interpreter
    implementation detail; Catalyst constant-folds these at plan time,
    which is the stronger guarantee.)"""
    assert spark.sql(f"SELECT ({expr}) AS v").collect()[0]["v"] is expected


# --- TestTypeConverter.java ----------------------------------------------

def test_boolean_value_conversion(spark):
    """TestTypeConverter.testGetBooleanValue: nonzero→true, 0→false,
    NULL→NULL."""
    row = spark.sql(
        "SELECT CAST(3 AS BOOLEAN) AS t, CAST(0 AS BOOLEAN) AS f, "
        "CAST(NULL AS BOOLEAN) AS n, true AS tt, false AS ff"
    ).collect()[0]
    assert row["t"] is True and row["f"] is False and row["n"] is None
    assert row["tt"] is True and row["ff"] is False


def test_literal_sql_types(spark):
    """TestTypeConverter.testGetSQLType: Java value classes → SQL types.
    Spark analog: literal typing (int literal→INTEGER, long→BIGINT,
    double→DOUBLE, string→VARCHAR-family)."""
    df = spark.sql(
        "SELECT 3 AS i, CAST(3 AS TINYINT) AS y, CAST(3 AS SMALLINT) AS s, "
        "3000000000 AS l, CAST(3.0 AS FLOAT) AS f, CAST(3.0 AS DOUBLE) AS d, "
        "'three' AS v"
    )
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {
        "i": "int", "y": "tinyint", "s": "smallint", "l": "bigint",
        "f": "float", "d": "double", "v": "string",
    }


# --- TestTime.java: TIME-of-day value semantics ---------------------------

def test_time_equality_semantics(spark):
    """TestTime.testEquals/testHashCode: two TIME values are equal iff all
    of (hour, minute, second, millisecond) agree.  The engine's TIME
    representation is the millisecond-precision string (SURVEY §2.8);
    string equality gives exactly the reference's component-wise rule."""
    mk = (
        "make_timestamp(1970, 1, 1, {h}, {m}, CAST({s} AS DECIMAL(8,3)) "
        "+ CAST({ms} AS DECIMAL(8,3)) / 1000)"
    )
    fmt = "date_format({0}, 'HH:mm:ss.SSS')"
    variants = [
        (23, 34, 15, 626),  # t0 == t1 baseline
        (23, 34, 15, 0),    # t2: ms differs
        (23, 34, 0, 626),   # t3: s differs
        (23, 0, 15, 626),   # t4: m differs
        (0, 34, 15, 626),   # t5: h differs
    ]
    exprs = [
        fmt.format(mk.format(h=h, m=m, s=s, ms=ms)) + f" AS t{i}"
        for i, (h, m, s, ms) in enumerate(variants)
    ]
    row = spark.sql("SELECT " + ", ".join(exprs)).collect()[0]
    t0 = row["t0"]
    assert t0 == "23:34:15.626"
    for i in range(1, 5):
        assert row[f"t{i}"] != t0


def test_doc_data_sql_replay(engine):
    """Replay the reference's demo script doc/data.sql verbatim (two
    CREATE TABLEs, an empty-result join before any INSERT, eight
    INSERTs), then verify the join the script sets up."""
    for t in ("states", "test"):
        engine.spark.sql(f"DROP TABLE IF EXISTS {t}")
        _clear_stale_location(engine.spark, t)
    script = """
        create table states ( id int, name varchar(30) );
        create table test ( id int, name varchar(30) );
        select t.id,t.name,s.id from test t inner join states s
          on t.id=s.id where t.id>0 order by t.id desc;
        INSERT INTO states VALUES (1, 'Alabama');
        INSERT INTO states VALUES (2, 'Alaska');
        INSERT INTO states VALUES (3, 'Arizona');
        INSERT INTO states VALUES (4, 'Arkansas');
        INSERT INTO states VALUES (5, 'California');
        INSERT INTO states VALUES (6, 'wuhan');
        INSERT INTO states VALUES (7, '1');
        INSERT INTO states VALUES (8, 'vv');
    """
    res = engine.execute_script(script)
    assert res[2] == []                     # join before inserts: empty
    # the script's own join, now that states has rows (test still empty)
    assert engine.execute_script(
        "select count(*) AS n from states"
    )[0][0]["n"] == 8
    engine.execute_script("INSERT INTO test VALUES (2, 'two'), (5, 'five')")
    rows = engine.execute_script(
        "select t.id,t.name,s.id from test t inner join states s "
        "on t.id=s.id where t.id>0 order by t.id desc"
    )[0]
    assert [tuple(r) for r in rows] == [(5, "five", 5), (2, "two", 2)]


def test_column_name_resolution_semantics(spark):
    """Behavioral analog of TestColumnName.java (wildcards, table
    qualification): `*`, `t.*`, `t.col`, bare `col`, and ambiguity.
    The reference models these as ColumnName objects; here they are
    resolution semantics of the analyzer."""
    import pytest as _pytest
    from pyspark.sql.utils import AnalysisException

    a = spark.createDataFrame([(1, "x")], "id long, va string")
    b = spark.createDataFrame([(1, "y")], "id long, vb string")
    a.createOrReplaceTempView("cn_a")
    b.createOrReplaceTempView("cn_b")

    # * expands both sides; t.* expands one side
    j = spark.sql("SELECT * FROM cn_a JOIN cn_b ON cn_a.id = cn_b.id")
    assert j.columns == ["id", "va", "id", "vb"]
    ja = spark.sql("SELECT cn_a.* FROM cn_a JOIN cn_b ON cn_a.id = cn_b.id")
    assert ja.columns == ["id", "va"]

    # qualified column resolves; unqualified ambiguous column errors
    one = spark.sql(
        "SELECT cn_a.id AS aid, cn_b.id AS bid FROM cn_a JOIN cn_b ON cn_a.id = cn_b.id"
    ).collect()[0]
    assert (one["aid"], one["bid"]) == (1, 1)
    with _pytest.raises(AnalysisException):
        spark.sql(
            "SELECT id FROM cn_a JOIN cn_b ON cn_a.id = cn_b.id"
        ).collect()

    # unqualified unique column resolves across the join
    assert spark.sql(
        "SELECT va FROM cn_a JOIN cn_b ON cn_a.id = cn_b.id"
    ).collect()[0]["va"] == "x"
