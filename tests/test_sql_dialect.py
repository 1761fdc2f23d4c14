"""SQL-dialect compatibility: the ANSI oracle queries also run through
Spark SQL (MapleEngine catalog) and produce the same result as the
DataFrame builders.

This is the §3 lifecycle claim made executable: the engine's surface is
reachable both programmatically (DataFrame) and through SQL text.  Queries
using DuckDB-only functions (list_filter, string_split, strftime,
quantile_cont, json_extract_string, generate_series) are excluded — their
Spark SQL spellings differ, and the DataFrame builder is the primary
surface.
"""

from __future__ import annotations

import math

import pytest

from conftest import SF_MED

#: oracle_sql entries that are engine-portable ANSI SQL
PORTABLE = [
    # s1_scan_filter left out: its oracle now formats the timestamp with
    # DuckDB strftime (driver-hash stability); the same scan+filter shape
    # is covered portably by s2/q6
    "s2_column_pruned_scan",
    "p1_project_expr",
    "p4_rename",
    "e1_arithmetic",
    "e3_null_compare",
    "e5_between",
    "e6_like",
    "e8_in_list",
    "e11_is_null",
    "j2_join_inner",
    "j4_join_left",
    "j4_join_right",
    "j4_join_full",
    "j5_using_join",
    "j6_cross_join",
    "j7_semi_in_subquery",
    "j7_anti_not_exists",
    "e10_scalar_subquery",
    "a2_groupby_q1",
    "a4_count_distinct",
    "a7_having",
    "a8_distinct",
    "o3_topk",
    "set_union",
    "set_intersect",
    "set_except",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q12_shipmode_priority",
    "q18_large_volume_customer",
    "q19_disjunctive_pushdown",
    "d1_dedup_exact",
    "t4_fingerprint",
    "sql_dialect",
    "e4_boolean_ops",
    "dml_update_where",
    "dml_delete_where",
    "hh1_heavy_hitters",
    "q2_groupwise_max",
    "q4_order_priority",
    "q7_volume_shipping",
    "q9_product_profit",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q22_global_sales_opportunity",
    "q8_market_share",
    "q11_important_stock",
    "q16_supplier_cnt",
    "q20_excess_shipments",
    "q21_waiting_supplier",
    "t6_quota_sample",
    "a9_grouping_sets",
    "w2_window_lead_movavg",
    "pv1_pivot",
    "pv2_unpivot",
    "set_intersect_all",
    "set_except_all",
    "str2_edit_distance",
    "lat1_lateral_topn",
]


def _norm(df):
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(None if math.isnan(v) else round(v, 9))
            else:
                row.append(v)
        rows.append(tuple(row))
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return rows


@pytest.fixture(scope="module")
def sql_env(spark):
    from maple_spark.catalog import register_views

    register_views(spark, SF_MED)
    return spark


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark(sql_env, name):
    import __spark_entry__ as e

    spark = sql_env
    df_result = _norm(e.queries()[name](spark, SF_MED))
    sql_result = _norm(spark.sql(e.oracle_sql()[name]))
    assert df_result == sql_result


# ----------------------------------------------------------------------
# Regex dialect notes: Spark compiles rlike/regexp_* with java.util.regex;
# DuckDB's regexp_matches uses RE2.  The engine's SIMILAR TO surface
# (functions.similar_to) therefore promises only the portable subset.
# ----------------------------------------------------------------------

#: constructs identical in java.util.regex and RE2 — safe for oracle-gated
#: queries and the documented SIMILAR TO contract
PORTABLE_REGEX = [
    ("[0-9]{3}$", "abc123", True),          # classes, bounded repeat, anchor
    ("^(foo|bar)x?", "barx", True),         # alternation, optional
    ("a.c", "abc", True),                   # dot
    ("\\d+\\s\\w+", "42 apples", True),     # perl classes
    ("(?i)HELLO", "hello", True),           # inline case flag
]

#: Java-only constructs — rlike accepts them, RE2 rejects or mis-parses;
#: they MUST NOT appear in oracle SQL (documented engine difference, like
#: the reference's own dialect quirks in nanosql.g)
JAVA_ONLY_REGEX = ["(?<=x)y", "(?=x)", "(a)\\1", "a*+"]


def test_portable_regex_subset_agrees(spark):
    """The blessed subset evaluates identically in Spark (Java regex) and
    DuckDB (RE2)."""
    import duckdb

    from pyspark.sql import functions as F

    con = duckdb.connect()
    for pat, s, want in PORTABLE_REGEX:
        got_spark = (
            spark.range(1)
            .select(F.lit(s).rlike(pat).alias("m"))
            .collect()[0]["m"]
        )
        got_duck = con.execute(
            "SELECT regexp_matches(?, ?)", [s, pat]
        ).fetchone()[0]
        assert got_spark == got_duck == want, (pat, s, got_spark, got_duck)


def test_java_only_regex_rejected_by_re2(spark):
    """The non-portable constructs really are non-portable: Spark accepts
    them, DuckDB/RE2 errors — proving the SIMILAR TO contract must exclude
    them (they are why e7's oracle uses the portable subset)."""
    import duckdb

    from pyspark.sql import functions as F

    con = duckdb.connect()
    for pat in JAVA_ONLY_REGEX:
        # Spark: compiles and runs
        spark.range(1).select(F.lit("xy").rlike(pat).alias("m")).collect()
        # DuckDB: RE2 refuses the pattern
        try:
            con.execute("SELECT regexp_matches('xy', ?)", [pat]).fetchone()
            re2_accepted = True
        except duckdb.Error:
            re2_accepted = False
        assert not re2_accepted, f"RE2 unexpectedly accepted {pat!r}"
