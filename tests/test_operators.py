"""Operator unit tests — reference layer 2 (SURVEY.md §5), fixture shapes
from FIXTURES.md (F1/F2 NULL-edge tables recreated literally)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from conftest import SF_DIR, ordered_rows, rows


def _f1(spark):
    """FIXTURES.md F1: test_simple_selects(a int, b int) with NULLs."""
    return spark.createDataFrame(
        [(0, None), (1, 10), (2, 20), (3, 30), (4, None)], "a int, b int"
    )


def _f2(spark):
    """FIXTURES.md F2: test_select_project(a int, b varchar, c int)."""
    return spark.createDataFrame(
        [
            (1, "red", 10),
            (2, "orange", 20),
            (3, None, 30),
            (4, "green", None),
            (5, "yellow", 40),
            (6, "blue", 50),
        ],
        "a int, b string, c int",
    )


# --- filter / 3VL (reference TestSimpleSelects.java:30-78) ----------------

def test_where_gt_drops_nulls(spark):
    # SELECT * FROM test_simple_selects WHERE b > 15  → NULL b rows drop out
    assert rows(_f1(spark).where(F.col("b") > 15)) == [(2, 20), (3, 30)]


def test_where_lt(spark):
    assert rows(_f1(spark).where(F.col("b") < 25)) == [(1, 10), (2, 20)]


def test_null_comparison_is_not_true(spark):
    # NULL = NULL must not match (CompareOperator.java:110-111)
    df = _f1(spark)
    assert rows(df.where(F.col("b") == F.col("b"))) == [
        (1, 10), (2, 20), (3, 30),
    ]


# --- projection / arithmetic (TestSelectProject.java:28-93) ---------------

def test_project_reorder(spark):
    assert rows(_f2(spark).select("c", "a")) == [
        (None, 4), (10, 1), (20, 2), (30, 3), (40, 5), (50, 6),
    ]


def test_arithmetic_null_propagates(spark):
    got = rows(_f2(spark).select((F.col("a") + F.col("c")).alias("s")))
    assert got == [(None,), (11,), (22,), (33,), (45,), (56,)]


# --- sort: NULLS FIRST on ASC (TupleComparator.java:104-113) --------------

def test_sort_nulls_first_asc(spark):
    from maple_spark.operators.sort import order_by

    got = ordered_rows(order_by(_f1(spark), ("b", True), ("a", True)))
    assert got == [(0, None), (4, None), (1, 10), (2, 20), (3, 30)]


def test_sort_nulls_last_desc(spark):
    from maple_spark.operators.sort import order_by

    got = ordered_rows(order_by(_f1(spark), ("b", False), ("a", True)))
    assert got == [(3, 30), (2, 20), (1, 10), (0, None), (4, None)]


def test_distributed_row_number_matches_global_window(spark):
    """Two-pass bucketed rank == single-partition global row_number, on a
    NULL-bearing, duplicate-heavy, skewed key (one value spans several
    quantiles → deduped cut points) with a tiebreaker completing the
    total order."""
    import random

    from pyspark.sql.window import Window

    from maple_spark.operators.sort import distributed_row_number

    rnd = random.Random(11)
    data = [
        (i, rnd.choice([None, 7, 7, 7, rnd.randint(0, 100)]))  # skew on 7 + NULLs
        for i in range(5000)
    ]
    df = spark.createDataFrame(data, "id int, k int")
    keys = [F.col("k").asc_nulls_first(), F.col("id").asc()]
    got = distributed_row_number(df, "k", keys, rn_name="rn", n_buckets=8)
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(*keys)).cast("bigint")
    )
    assert rows(got.select("id", "k", "rn")) == rows(want.select("id", "k", "rn"))


# --- joins: all five JoinTypes with correct null-padding ------------------

def _join_pair(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, l string")
    right = spark.createDataFrame([(2, "x"), (3, "y"), (4, "z")], "id int, r string")
    return left, right


def test_join_inner(spark):
    from maple_spark.operators.joins import join

    l, r = _join_pair(spark)
    got = rows(join(l, r, on=l["id"] == r["id"], how="INNER").select("l", "r"))
    assert got == [("b", "x"), ("c", "y")]


def test_join_left_outer_pads(spark):
    from maple_spark.operators.joins import join

    l, r = _join_pair(spark)
    got = rows(join(l, r, on=l["id"] == r["id"], how="LEFT_OUTER").select("l", "r"))
    assert got == [("a", None), ("b", "x"), ("c", "y")]


def test_join_full_outer_pads_both(spark):
    from maple_spark.operators.joins import join

    l, r = _join_pair(spark)
    got = rows(join(l, r, on=l["id"] == r["id"], how="FULL_OUTER").select("l", "r"))
    assert got == [(None, "z"), ("a", None), ("b", "x"), ("c", "y")]


def test_cross_join_count(spark):
    from maple_spark.operators.joins import cross_join

    l, r = _join_pair(spark)
    assert cross_join(l, r).count() == 9


def test_natural_join_dedups_column(spark):
    from maple_spark.operators.joins import natural_join

    l, r = _join_pair(spark)
    nj = natural_join(l, r)
    assert nj.columns == ["id", "l", "r"]  # join col once, left-first
    assert rows(nj) == [(2, "b", "x"), (3, "c", "y")]


def test_semi_anti(spark):
    from maple_spark.operators.joins import anti_join, semi_join

    l, r = _join_pair(spark)
    assert rows(semi_join(l, r, l["id"] == r["id"])) == [(2, "b"), (3, "c")]
    assert rows(anti_join(l, r, l["id"] == r["id"])) == [(1, "a")]


# --- NOT IN 3VL (subquery.py) ---------------------------------------------

def test_not_in_with_null_subquery_is_empty(spark):
    from maple_spark.operators.subquery import not_in_subquery

    left = spark.createDataFrame([(1,), (2,)], "x int")
    sub_with_null = spark.createDataFrame([(2,), (None,)], "y int")
    assert not_in_subquery(left, "x", sub_with_null).count() == 0


def test_not_in_without_null(spark):
    from maple_spark.operators.subquery import not_in_subquery

    left = spark.createDataFrame([(1,), (2,)], "x int")
    sub = spark.createDataFrame([(2,), (3,)], "y int")
    assert rows(not_in_subquery(left, "x", sub).select("x")) == [(1,)]


def test_not_in_null_left_rows(spark):
    """ANSI (PostgreSQL/DuckDB agree): NULL NOT IN (empty set) is TRUE —
    the NULL left row survives; NULL NOT IN (non-empty set) is NULL —
    dropped (review finding, round 4)."""
    from maple_spark.operators.subquery import not_in_subquery

    left = spark.createDataFrame([(None,), (1,), (2,)], "x int")
    empty = spark.createDataFrame([], "y int")
    got = sorted(
        (r.x for r in not_in_subquery(left, "x", empty).collect()),
        key=lambda v: (v is None, v),
    )
    assert got == [1, 2, None]
    nonempty = spark.createDataFrame([(1,)], "y int")
    assert rows(not_in_subquery(left, "x", nonempty).select("x")) == [(2,)]


# --- aggregates: NULL-skipping (CountAggregate/SumAvgAggregate) -----------

def test_count_ignores_nulls(spark):
    df = _f1(spark)
    got = df.agg(
        F.count(F.lit(1)).alias("star"), F.count("b").alias("b")
    ).collect()[0]
    assert (got["star"], got["b"]) == (5, 3)


def test_sum_avg_skip_nulls_all_null_group_is_null(spark):
    df = spark.createDataFrame(
        [("g1", None), ("g1", None), ("g2", 5)], "g string, v int"
    )
    got = rows(df.groupBy("g").agg(F.sum("v").alias("s"), F.avg("v").alias("a")))
    assert got == [("g1", None, None), ("g2", 5, 5.0)]


def test_having(spark):
    from maple_spark.operators.aggregate import group_aggregate

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "g string, v int"
    )
    got = rows(
        group_aggregate(
            df, ["g"], [F.count(F.lit(1)).alias("n")], having=F.col("n") > 1
        )
    )
    assert got == [("a", 2)]


# --- DML rewrite helpers --------------------------------------------------

def test_update_delete_roundtrip(spark, tmp_warehouse):
    from maple_spark.operators.dml import (
        delete_where,
        insert_rows,
        overwrite_table,
        update_where,
    )

    path = f"{tmp_warehouse}/t1"
    insert_rows(spark, path, [{"id": 1, "v": 10}, {"id": 2, "v": 20}])
    df = spark.read.parquet(path)
    updated = update_where(df, F.col("id") == 1, {"v": F.lit(99)})
    assert rows(updated.select("id", "v")) == [(1, 99), (2, 20)]
    deleted = delete_where(df, F.col("id") == 2)
    assert rows(deleted.select("id", "v")) == [(1, 10)]
    overwrite_table(updated, f"{tmp_warehouse}/t1_v2")
    assert rows(spark.read.parquet(f"{tmp_warehouse}/t1_v2").select("id", "v")) == [
        (1, 99), (2, 20),
    ]


def test_insert_select_and_compact(spark, tmp_warehouse):
    """INSERT..SELECT (S10) + OPTIMIZE/compact (§2.11): fragmented table
    directory coalesced to the target file count."""
    from maple_spark.operators.dml import compact, insert_select

    path = f"{tmp_warehouse}/frag"
    base = spark.range(100).withColumnRenamed("id", "v")
    for _ in range(4):  # 4 appends → many small files
        insert_select(base.repartition(4), path)
    import glob

    assert len(glob.glob(f"{path}/part-*.parquet")) >= 16
    compacted = compact(spark, path, target_partitions=2)
    assert compacted.count() == 400
    out = f"{tmp_warehouse}/compacted"
    compacted.write.parquet(out)
    assert len(glob.glob(f"{out}/part-*.parquet")) == 2


# --- scalar functions (FunctionDirectory parity) --------------------------

def test_scalar_function_directory(spark):
    from maple_spark import functions as mf

    df = spark.createDataFrame([(-3, 2.25, None)], "i int, d double, n int")
    got = df.select(
        mf.ABS("i").alias("abs"),
        mf.CEIL("d").alias("ceil"),
        mf.FLOOR("d").alias("floor"),
        mf.SQRT(F.lit(9.0)).alias("sqrt"),
        mf.POW(F.lit(2.0), F.lit(10.0)).alias("pow"),
        mf.COALESCE(F.col("n"), F.col("i")).alias("coal"),
        mf.GREATEST("i", "n", F.lit(0)).alias("gr"),
        mf.LEAST("i", F.lit(0)).alias("le"),
        mf.IF(F.col("i") < 0, F.lit("neg"), F.lit("pos")).alias("if_"),
        mf.IFNULL(F.col("n"), F.lit(-1)).alias("ifn"),
        mf.NULLIF(F.col("i"), F.lit(-3)).alias("nif"),
        mf.CONCAT(F.lit("a"), F.lit("b")).alias("cc"),
    ).collect()[0]
    assert tuple(got) == (3, 3, 2, 3.0, 1024.0, -3, 0, -3, "neg", -1, None, "ab")


def test_like_rlike_work(spark):
    # reference stubs these to always-false; we implement real semantics
    from maple_spark import functions as mf

    df = spark.createDataFrame([("hello",), ("world",)], "s string")
    assert rows(df.where(mf.LIKE(F.col("s"), "he%"))) == [("hello",)]
    assert rows(df.where(mf.SIMILAR_TO(F.col("s"), "^w.*d$"))) == [("world",)]


def test_update_where_assignments_see_pre_update_row(spark):
    """SQL UPDATE semantics: SET a = b, b = a swaps — every assignment
    evaluates against the PRE-update row (review finding, round 4)."""
    from maple_spark.operators.dml import update_where

    df = spark.createDataFrame([(1, 10, 20)], "id int, a int, b int")
    got = rows(
        update_where(df, F.col("id") == 1, {"a": F.col("b"), "b": F.col("a")})
    )
    assert got == [(1, 20, 10)]


def test_fk_violations_null_fk_is_satisfied(spark):
    """ANSI MATCH SIMPLE: a NULL FK satisfies the constraint — only
    non-NULL keys must find a parent (review finding, round 4)."""
    from maple_spark.constraints import fk_violations

    child = spark.createDataFrame(
        [(1, 10), (2, None), (3, 99)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,)], "pk int")
    got = rows(fk_violations(child, ["fk"], parent, ["pk"]).select("id"))
    assert got == [(3,)]


def test_natural_join_disjoint_schemas_keeps_outer_semantics(spark):
    """NATURAL LEFT JOIN with no common columns degenerates to LEFT JOIN
    ON TRUE: every left row survives even against an empty right side
    (review finding, round 4)."""
    from maple_spark.operators.joins import natural_join

    left = spark.createDataFrame([(1,), (2,)], "a int")
    right = spark.createDataFrame([], "b string")
    got = rows(natural_join(left, right, how="LEFT_OUTER"))
    assert got == [(1, None), (2, None)]
