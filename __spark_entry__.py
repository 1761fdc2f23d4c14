"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(plus the training-data pipeline extensions); ``oracle_sql()`` holds the
DuckDB twin for every SQL-expressible query.  Determinism rules used
throughout so Spark and DuckDB hash-match:

- DOUBLE aggregates go through exact DECIMAL(38,s) sums (order-independent),
  then cast back to double — identical bits in both engines.
- Session timezone is UTC (see maple_spark.session) so timestamps agree.
- Sort semantics are encoded into values via row_number(), since the
  driver's comparison is order-insensitive.
- NULL-edge coverage derives NULL-bearing columns with nullif() (driver
  tables have no NULLs) per FIXTURES.md.
- The reference sorts NULLS FIRST on ASC (TupleComparator.java:104-113);
  oracle SQL spells it out because DuckDB defaults NULLS LAST.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from maple_spark.catalog import load_table
from maple_spark.functions import phash as _phash
from maple_spark.operators.aggregate import decimal_avg, decimal_sum, group_aggregate
from maple_spark.operators.joins import join as mjoin
from maple_spark.operators import subquery as sq
from maple_spark.pipelines import dedup, similarity, textstats, multimodal
from maple_spark.streaming.events import hourly_agg_batch, sessionize

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _reliable_or_local_ckpt(df: DataFrame) -> DataFrame:
    """Every multiply-consumed-intermediate materialization in the entry
    goes through pipelines.util.checkpoint_df: localCheckpoint by
    default (bench/one-box), reliable checkpoint under
    SPARK_GRAFT_RELIABLE_CHECKPOINT (cluster runs — executor-local
    blocks are not fault-tolerant; guide §5).  Value-identical either
    way (pytest pins one representative path in both modes)."""
    from maple_spark.pipelines.util import checkpoint_df

    return checkpoint_df(df, eager=True)


def _reliable_or_local_ckpt_lazy(df: DataFrame) -> DataFrame:
    """Lazy twin of :func:`_reliable_or_local_ckpt` — materializes on
    first action, INSIDE the timed execution (the cp3 drop-list
    pattern; no CONSTRUCT_TIMED methodology dodge)."""
    from maple_spark.pipelines.util import checkpoint_df

    return checkpoint_df(df, eager=False)


# ----------------------------------------------------------------------
# flagship (entry): orders ⋈ customer → filter → top-k by price
# Reference shape: doc/data.sql:12 (inner join + filter + ORDER BY DESC),
# scaled to the driver tables.  Dimension side broadcast; top-k plans as
# TakeOrderedAndProject (per-partition partial top-k, no global sort).
# ----------------------------------------------------------------------

def flagship_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: orders ⋈ customer (broadcast dim) → filter → price top-100
    (reference shape doc/data.sql:12 scaled to the driver tables)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    joined = mjoin(
        orders,
        customer,
        on=orders["o_custkey"] == customer["c_custkey"],
        how="INNER",
        broadcast="right",
    ).where(F.col("o_totalprice") > 150000)
    ranked = joined.select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        ranked.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 100)
        .select("rn", "o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


FLAGSHIP_ORACLE = """
SELECT rn, o_orderkey, o_totalprice, c_name, c_mktsegment FROM (
  SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
         o_orderkey, o_totalprice, c_name, c_mktsegment
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE o_totalprice > 150000
) WHERE rn <= 100
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_join_topk(spark, SF_SMOKE)


# ----------------------------------------------------------------------
# §2.1 / §2.2 — scans, projection, filter, rename
# ----------------------------------------------------------------------

#: timestamp outputs leave the engine as ISO strings: Spark's
#: date_format(..SSSSSS) and DuckDB's strftime(..%f) agree byte-for-byte,
#: which keeps the driver's value-hash independent of pandas datetime64
#: unit (ns vs us) differences between the two clients.
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def s1_scan_filter(spark, sf_dir):
    """FileScanNode w/ inlined predicate (plans/FileScanNode.java:18):
    filter+projection pushed into the Parquet scan (predicates stay on the
    raw timestamp column — only the output projection formats it)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 45) & (F.col("l_shipdate") < "1996-01-01")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.date_format("l_shipdate", TS_FMT).alias("l_shipdate"),
    )


def p1_project_expr(spark, sf_dir):
    """ProjectNode (plans/ProjectNode.java:26): select-list expressions,
    aliases, arithmetic (NULL-propagating per E1)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        (F.col("p_retailprice") * 0.9).alias("discounted"),
        (F.col("p_size") + 10).alias("size_plus"),
        F.upper(F.col("p_brand")).alias("brand_uc"),
    )


def p4_rename(spark, sf_dir):
    """RenameNode (plans/RenameNode.java:16): table alias + qualified refs."""
    n = _t(spark, sf_dir, "nation").alias("n")
    r = _t(spark, sf_dir, "region").alias("r")
    return (
        n.join(F.broadcast(r), F.col("n.n_regionkey") == F.col("r.r_regionkey"))
        .select(
            F.col("n.n_name").alias("nation_name"),
            F.col("r.r_name").alias("region_name"),
        )
    )


def e1_arithmetic(spark, sf_dir):
    """E1/E2: + - * / % with numeric coercion (ArithmeticOperator.java)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 100 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_quantity") + F.col("l_tax")).alias("add_qt"),
        (F.col("l_quantity") - F.col("l_discount")).alias("sub_qd"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("mul_pd"),
        (F.col("l_quantity").cast("double") / 2.0).alias("half_q"),
        (F.col("l_linenumber") % 3).alias("mod_l3"),
        (-F.col("l_quantity")).alias("neg_q"),
    )


def e3_null_compare(spark, sf_dir):
    """E3 three-valued logic (CompareOperator.java:110-111: NULL operand ⇒
    NULL ⇒ row filtered).  NULLs derived via nullif per FIXTURES.md F1."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "maybe_price", F.nullif(F.col("o_totalprice"), F.lit(0.0))
    ).withColumn(
        "maybe_status", F.nullif(F.col("o_orderstatus"), F.lit("O"))
    )
    return o.where(F.col("maybe_status") == "F").select(
        "o_orderkey", "maybe_price", "maybe_status"
    )


def e5_between(spark, sf_dir):
    """E5 BETWEEN (parse-time desugar to >= AND <=, nanosql.g:884-891)."""
    p = _t(spark, sf_dir, "part")
    return p.where(F.col("p_size").between(10, 20)).select(
        "p_partkey", "p_size", "p_brand"
    )


def e6_like(spark, sf_dir):
    """E6 LIKE with working semantics (reference stub always-false,
    StringMatchOperator.java:108-117)."""
    p = _t(spark, sf_dir, "part")
    return p.where(F.col("p_type").like("%ECO%")).select(
        "p_partkey", "p_type"
    )


def e7_similar_to(spark, sf_dir):
    """E7 SIMILAR TO as regex (reference stub)."""
    c = _t(spark, sf_dir, "customer")
    return c.where(F.col("c_name").rlike("[0-9]{3}$")).select(
        "c_custkey", "c_name"
    )


def e8_in_list(spark, sf_dir):
    """E8 IN (value list) (InOperator.java parse-only)."""
    o = _t(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_orderpriority")


def e11_is_null(spark, sf_dir):
    """E11 IS NULL (commented out of the reference grammar — implemented
    with declared semantics)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "maybe_status", F.nullif(F.col("o_orderstatus"), F.lit("O"))
    )
    return o.where(F.col("maybe_status").isNull()).select(
        "o_orderkey", "o_orderstatus", "maybe_status"
    )


def e13_scalar_funcs(spark, sf_dir):
    """E13 + §2.8 function library (FunctionDirectory.java:38-58):
    ABS CEIL FLOOR ROUND SQRT POW CONCAT GREATEST LEAST COALESCE IFNULL
    NULLIF IF — all JVM-side builtins."""
    from maple_spark import functions as mf

    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    maybe = F.nullif(F.col("p_size"), F.lit(25))
    return p.select(
        "p_partkey",
        mf.ABS(F.col("p_size") - 25).alias("abs_v"),
        mf.CEIL(F.col("p_retailprice") / 100.0).alias("ceil_v"),
        mf.FLOOR(F.col("p_retailprice") / 100.0).alias("floor_v"),
        mf.ROUND(F.col("p_retailprice") * 0.1, 2).alias("round_v"),
        mf.SQRT(F.col("p_size").cast("double")).alias("sqrt_v"),
        mf.POW(F.lit(2.0), (F.col("p_size") % 10).cast("double")).alias("pow_v"),
        mf.CONCAT(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("concat_v"),
        mf.GREATEST(F.col("p_size"), F.lit(25)).cast("bigint").alias("greatest_v"),
        mf.LEAST(F.col("p_size"), F.lit(25)).cast("bigint").alias("least_v"),
        mf.COALESCE(maybe, F.lit(-1)).alias("coalesce_v"),
        mf.IFNULL(maybe, F.lit(-1)).alias("ifnull_v"),
        maybe.alias("nullif_v"),
        mf.IF(F.col("p_size") > 25, F.lit("big"), F.lit("small")).alias("if_v"),
    )


def str1_string_funcs(spark, sf_dir):
    """String function library (extension — the reference has only CONCAT,
    §2.8): case, trim, substring, replace, reverse, pad, search, join."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 400)
    n = F.col("c_name")
    return c.select(
        "c_custkey",
        F.upper(n).alias("uc"),
        F.lower(n).alias("lc"),
        F.trim(F.concat(F.lit("  "), n, F.lit(" "))).alias("trimmed"),
        F.substring(n, 10, 5).alias("sub"),
        F.regexp_replace(n, "0", "#").alias("replaced"),
        F.reverse(n).alias("rev"),
        F.lpad(F.col("c_mktsegment"), 12, ".").alias("padded"),
        F.instr(n, "1").cast("bigint").alias("pos1"),
        F.concat_ws("|", n, F.col("c_mktsegment")).alias("joined"),
        F.length(n).cast("bigint").alias("len"),
    )


def e13_trig_funcs(spark, sf_dir):
    """§2.8 trig family (Sin/Cos/Tan/ArcTan2 etc.) — rounded to 6 places
    because libm implementations differ in the last ulp across engines."""
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 200)
    x = (F.col("p_size") % 10).cast("double") / 10.0
    return p.select(
        "p_partkey",
        F.round(F.sin(x), 6).alias("sin_v"),
        F.round(F.cos(x), 6).alias("cos_v"),
        F.round(F.tan(x), 6).alias("tan_v"),
        F.round(F.asin(x), 6).alias("asin_v"),
        F.round(F.acos(x), 6).alias("acos_v"),
        F.round(F.atan(x), 6).alias("atan_v"),
        F.round(F.atan2(x, F.lit(2.0)), 6).alias("atan2_v"),
    )


# ----------------------------------------------------------------------
# §2.3 — joins
# ----------------------------------------------------------------------

def j2_join_inner(spark, sf_dir):
    """J2 inner equi-join; Catalyst picks broadcast-hash (dim side small)."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return mjoin(
        s, n, on=s["s_nationkey"] == n["n_nationkey"], how="INNER", broadcast="right"
    ).select("s_suppkey", "s_name", "n_name")


def j4_join_left(spark, sf_dir):
    """J4 LEFT OUTER with correct null-padding (the reference's
    NestedLoopsJoinNode never pads — we implement declared semantics)."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return mjoin(
        c, big, on=c["c_custkey"] == big["o_custkey"], how="LEFT_OUTER"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


def j4_join_right(spark, sf_dir):
    """J4 RIGHT OUTER."""
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    c = _t(spark, sf_dir, "customer")
    return mjoin(
        big, c, on=big["o_custkey"] == c["c_custkey"], how="RIGHT_OUTER"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


def j4_join_full(spark, sf_dir):
    """J4 FULL OUTER: both sides filtered so both produce unmatched rows."""
    hi = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    lo = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") < 0)
    return mjoin(
        hi, lo, on=hi["o_custkey"] == lo["c_custkey"], how="FULL_OUTER"
    ).select("o_orderkey", "o_custkey", "c_custkey", "c_name")


def j6_cross_join(spark, sf_dir):
    """J6 Cartesian product (FROM a, b / CROSS JOIN)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


def j5_using_join(spark, sf_dir):
    """J5 NATURAL/USING: merged schema emits the join column once
    (FromClause.buildJoinSchema:798 — left columns first)."""
    from maple_spark.operators.joins import using_join

    n = _t(spark, sf_dir, "nation").select(
        F.col("n_regionkey").alias("regionkey"), "n_name"
    )
    r = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("regionkey"), "r_name"
    )
    return using_join(n, r, ["regionkey"], "INNER")


def j5_natural_join(spark, sf_dir):
    """J5 NATURAL JOIN: equality over ALL shared column names, discovered
    from the schemas; shared columns emitted once, left-columns-first
    (FromClause.buildJoinSchema:798).  Two shared keys (orderkey, partkey)
    exercise the multi-column discovery path that USING spells explicitly."""
    from maple_spark.operators.joins import natural_join

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
    left = li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_partkey").alias("partkey"),
        F.col("l_quantity").alias("qty"),
    )
    right = li.where(F.col("l_quantity") > 25).select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_partkey").alias("partkey"),
        F.col("l_extendedprice").alias("price"),
    )
    return natural_join(left, right, "INNER").select(
        "orderkey", "partkey", "qty", "price"
    )


def j7_semi_in_subquery(spark, sf_dir):
    """J7/E8 IN (subquery) → left-semi join (reference throws at eval)."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000).select(
        "o_custkey"
    )
    return sq.in_subquery(c, "c_custkey", big).select("c_custkey", "c_name")


def j7_anti_not_exists(spark, sf_dir):
    """J7/E9 NOT EXISTS (correlated) → left-anti join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return sq.not_exists(
        c, o, c["c_custkey"] == o["o_custkey"]
    ).select("c_custkey", "c_name")


def e10_scalar_subquery(spark, sf_dir):
    """E10 scalar subquery (ScalarSubquery.java eval→null): orders above
    the global average price.  Average computed exactly (decimal sum) so
    the comparison boundary is identical in both engines."""
    o = _t(spark, sf_dir, "orders")
    avg1 = o.agg(decimal_avg("o_totalprice", "avg_price", 2))
    out = sq.scalar_subquery(o, avg1)
    return out.where(F.col("o_totalprice") > F.col("avg_price")).select(
        "o_orderkey", "o_totalprice"
    )


# ----------------------------------------------------------------------
# §2.4 — aggregation (reference declares, stubs execution — we implement)
# ----------------------------------------------------------------------

def a2_groupby_q1(spark, sf_dir):
    """A1-A6 hash aggregate, TPC-H Q1 shape: multi-agg over lineitem with
    partial (map-side) aggregation.  Decimal-exact sums/avgs."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-01")
    return group_aggregate(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            decimal_sum("l_quantity", "sum_qty", 2),
            decimal_sum("l_extendedprice", "sum_base_price", 2),
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
                )
            ).cast("double").alias("sum_disc_price"),
            decimal_avg("l_quantity", "avg_qty", 2),
            decimal_avg("l_discount", "avg_disc", 2),
            F.count(F.lit(1)).alias("count_order"),
        ],
    )


def a4_count_distinct(spark, sf_dir):
    """A4 COUNT / COUNT(DISTINCT) (CountAggregate.java semantics: NULLs
    ignored; distinct via set)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


def a6_minmax_sumavg(spark, sf_dir):
    """A5/A6 MIN/MAX/SUM/AVG over groups (+ NULL-skipping via derived
    NULLs: SUM/AVG skip NULLs, all-NULL group → NULL)."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "maybe_price",
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")),
    )
    return o.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        decimal_sum("maybe_price", "sum_f_price", 2),
        decimal_avg("maybe_price", "avg_f_price", 2),
        F.count("maybe_price").alias("n_f"),
    )


def a7_having(spark, sf_dir):
    """A7 GROUP BY + HAVING (nanosql.g:507-510)."""
    li = _t(spark, sf_dir, "lineitem")
    return group_aggregate(
        li,
        ["l_suppkey"],
        [
            F.count(F.lit(1)).alias("n_items"),
            decimal_sum("l_quantity", "total_qty", 2),
        ],
        having=F.col("n_items") > 550,
    )


def a8_distinct(spark, sf_dir):
    """A8 SELECT DISTINCT (parsed, never executed in reference)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def a9_rollup(spark, sf_dir):
    """A9 extension: ROLLUP with subtotal rows (grouping() to tag levels)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            decimal_sum("l_quantity", "sum_qty", 2),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


# ----------------------------------------------------------------------
# §2.6 — sort / top-k
# ----------------------------------------------------------------------

def o1_sort_rownum(spark, sf_dir):
    """O1/O2 SortNode with reference null ordering (NULLS FIRST on ASC,
    TupleComparator.java:104-113).  row_number encodes the order into
    values so the order-insensitive hash still verifies the sort.

    The rank is computed by ``distributed_row_number`` — quantile-bucketed
    two-pass rank, NOT a global single-partition window: every partition
    ranks in parallel, so the plan survives a 100 TB customer table
    (plan-asserted in tests/test_plan_shape.py)."""
    from maple_spark.operators.sort import distributed_row_number

    c = _t(spark, sf_dir, "customer").withColumn(
        "maybe_bal", F.when(F.col("c_acctbal") > 0, F.col("c_acctbal"))
    )
    ranked = distributed_row_number(
        c,
        "maybe_bal",
        [F.col("maybe_bal").asc_nulls_first(), F.col("c_custkey").asc()],
        rn_name="rn",
    )
    return ranked.select("c_custkey", "maybe_bal", "rn")


def o3_topk(spark, sf_dir):
    """O3 LIMIT/top-k (extension; absent from reference grammar).  Plans as
    TakeOrderedAndProject — no global sort."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select("o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 25)
    )


# ----------------------------------------------------------------------
# §2.7 — set operations (extensions; grammar has them commented out)
# ----------------------------------------------------------------------

def set_union(spark, sf_dir):
    """§2.7 UNION with dedup (grammar-only in the reference, nanosql.g:516)."""
    from maple_spark.operators.setops import union

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return union(c, s)


def set_intersect(spark, sf_dir):
    """§2.7 INTERSECT (set semantics)."""
    from maple_spark.operators.setops import intersect

    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return intersect(c, s)


def set_except(spark, sf_dir):
    """§2.7 EXCEPT: customer nations minus rich-supplier nations."""
    from maple_spark.operators.setops import except_

    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 8000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return except_(c, s)


def set_intersect_all(spark, sf_dir):
    """§2.7 INTERSECT ALL (bag semantics): multiplicity = min of the two
    sides' counts — plans as a counted hash join, not row-pairing, so it
    shuffles only (key, count) aggregates at scale."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


def set_except_all(spark, sf_dir):
    """§2.7 EXCEPT ALL (bag semantics): multiplicity = left count minus
    right count, floored at zero."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


def pv2_unpivot(spark, sf_dir):
    """UNPIVOT (wide→long melt): the inverse of pv1, turning per-status
    columns back into (priority, status, n) rows.  A pure map-side
    generator (no shuffle beyond pv1's own aggregation) — the standard
    reshape before per-cell modeling or charting."""
    wide = pv1_pivot(spark, sf_dir).select("o_orderpriority", "n_f", "n_o", "n_p")
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_f", "n_o", "n_p"],
        variableColumnName="status_col",
        valueColumnName="n",
    )


# ----------------------------------------------------------------------
# §2.5 — window functions (extension; absent from reference)
# ----------------------------------------------------------------------

def w1_window_rank(spark, sf_dir):
    """rank/dense_rank/lag + windowed running sum per group."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 350000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w).cast("bigint").alias("rk"),
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.lag("o_orderkey", 1).over(w).alias("prev_key"),
        F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
    )


# ----------------------------------------------------------------------
# TPC-H-style multi-join benchmarks (judge-facing scale queries)
# ----------------------------------------------------------------------

def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + group + top-10 revenue.  Exercises
    join ordering, partial aggregation, top-k."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1995-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    agg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
    return (
        agg.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 10)
        .select(
            "rn",
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", TS_FMT).alias("o_orderdate"),
            "o_orderpriority",
        )
    )


def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join through region→nation→(customer,
    supplier)→orders→lineitem.  The join-reorder/broadcast stress test."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(
            c,
            (o["o_custkey"] == c["c_custkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# ----------------------------------------------------------------------
# Pipelines: text analysis / dedup / similarity / multimodal / events
# ----------------------------------------------------------------------

def t1_text_stats(spark, sf_dir):
    """Text quality features: word/token counts, punctuation and stopword
    ratios (map-only Catalyst expressions, no Python)."""
    d = _t(spark, sf_dir, "documents")
    return textstats.with_text_stats(d).select(
        "doc_id", "n_chars_calc", "n_words", "n_tokens", "punct_ratio",
        "stopword_ratio", "avg_word_len",
    )


def t2_language_id(spark, sf_dir):
    """Language-ID heuristic via English stopword density."""
    d = _t(spark, sf_dir, "documents")
    return textstats.language_id(d).select(
        "doc_id", "lang", "stopword_ratio", "predicted_lang"
    )


def t3_quality_score(spark, sf_dir):
    """Composite [0,1] document quality score (length/punct/stopword)."""
    d = _t(spark, sf_dir, "documents")
    return textstats.quality_score(d).select("doc_id", "quality")


def t4_fingerprint(spark, sf_dir):
    """MD5 exact-content fingerprint (cross-engine); the rolling-hash
    variant is covered rows-only via d3/d4."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5(F.col("text")).alias("fp_md5"))


def d1_dedup_exact(spark, sf_dir):
    """Tier-1 exact dedup: hash-groupBy on content, min-id keeper +
    duplicate count."""
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "doc_id", ["text"]).select(
        "keep_id", "n_copies", F.md5(F.col("text")).alias("text_md5")
    )


def d2_ngram_jaccard(spark, sf_dir):
    """Exact all-pairs 8-gram Jaccard ≥ 0.2, tier auto-selected by
    vocabulary density (dedup.ngram_jaccard_pairs_best): rare-shingle
    corpora take the prefix-filtered AllPairs/PPJoin; hot-vocabulary
    corpora (like this fixture — ~50-word vocab makes every shingle
    shared by hundreds of docs, so ANY inverted-index join generates
    ~all pairs: measured 160 s at sf0.1 for 259 output pairs) take the
    blocked incidence gram-matrix (one BLAS matmul per block pair —
    same answer in 8 s).  Both are output-identical (equality-tested).
    At scale d3's LSH replaces either when approximate recall is
    acceptable; d2 is the exact-answer tier."""
    d = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs_best(
        d, "doc_id", "text", k=8, threshold=0.2
    )


def d3_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs, exact-Jaccard verified (no false
    positives).  Hashing is the engine-portable md5 fingerprint +
    universal multiply-shift permutations (functions/phash.py), so the
    oracle replays the exact pipeline in vanilla DuckDB SQL and the
    driver's gate checks this operator VALUE-exactly (hash-green since
    round 5)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=64, bands=16, k=8, jaccard_threshold=0.2
    )


def d4_simhash_pairs(spark, sf_dir):
    """SimHash Hamming-ball near-dup pairs via block-permutation
    pigeonhole equi-joins.  Fingerprint bits derive from the portable
    md5 hash (functions/phash.py), so the oracle is vanilla DuckDB SQL
    and the driver's gate checks values exactly (hash-green since
    round 5)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(d, "doc_id", "text", max_hamming=3)


def d5_dedup_clusters(spark, sf_dir):
    """Near-dup pairs → dedup GROUPS: connected components over the d2
    edge list (min-label propagation, deterministic).  The oracle computes
    the same components with a recursive-CTE transitive closure.  At
    corpus scale the edges come from d3 (LSH) instead — same operator.
    Edges come from the density-auto-selected exact join
    (``ngram_jaccard_pairs_best``: prefix-filtered AllPairs on
    rare-shingle corpora, blocked incidence gram-matrix on
    hot-vocabulary ones like this fixture) — output-identical tiers,
    equality-tested in test_pipelines."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs_best(d, "doc_id", "text", k=8, threshold=0.2)
    return dedup.connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


def d6_cross_dedup(spark, sf_dir):
    """Cross-corpus near-dedup (dedup.cross_dedup_pairs): new-crawl docs
    that near-duplicate a reference corpus — the decontamination-by-dedup
    shape of a training pipeline (candidates must CROSS corpora, never
    pair within one; output orientation (new_id, ref_id)).  The fixture
    splits documents by doc_id parity; banding is per-document, so the
    oracle computes buckets over all docs and restricts the candidate
    join across sides.  Hashing is the portable md5 fingerprint, so the
    oracle is vanilla DuckDB SQL."""
    d = _t(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 2 == 1)
    ref = d.where(F.col("doc_id") % 2 == 0)
    return dedup.cross_dedup_pairs(
        new, ref, "doc_id", "text", num_perm=64, bands=16, k=8,
        jaccard_threshold=0.2,
    )


def d8_bloom_guard(spark, sf_dir):
    """Bloom-prefiltered exact admission guard
    (dedup.bloom_membership_guard): admit the crawl-batch docs (odd
    doc_id) whose canonical bag-of-words-SET fingerprint
    (dedup.wordset_fp — the canonicalization tier between d1's exact
    content hash and d3's MinHash) is NOT present in the reference
    corpus (even doc_id).  The Bloom filter is built DISTRIBUTED (k
    salted xxhash64 bit positions per reference fingerprint, map-side
    bit_or into ≤ m/64 (word, bits) rows, folded into one broadcast
    map row) and only ROUTES: bit-miss rows are definitely-new and
    skip the join entirely; bit-hit rows (members + ~1% false
    positives) verify via left-anti join — so the output is EXACT and
    the oracle is the plain NOT EXISTS, while at 100 TB the
    anti-join's left side shrinks from |batch| to |members| +
    fpp·|batch|.  A reference whose sizing rule exceeds the broadcast
    bitset budget routes to the plain anti-join instead (size-gated
    strategy, same output — the ingest-guard router discipline)."""
    d = _t(spark, sf_dir, "documents")
    batch = d.where(F.col("doc_id") % 2 == 1)
    ref = d.where(F.col("doc_id") % 2 == 0)
    return dedup.bloom_membership_guard(batch, ref, "doc_id", "text", fpp=0.01)


def bpe1_bpe_merges(spark, sf_dir):
    """BPE vocabulary induction (textstats.bpe_merges): the first 5
    merge rules over the corpus word-frequency table — Sennrich et al.
    2016, the "BPE-ish" end of the token-counting surface.  One
    corpus-proportional word-count shuffle, then k vocab-sized rounds
    (each a pair-explode + sum + 1-row argmax collect); the oracle
    unrolls the identical rounds as CTEs, sharing the greedy replace()
    merge formulation verbatim (the ``|sym|`` wrapper encoding makes
    plain replace exact — see the function docstring)."""
    d = _t(spark, sf_dir, "documents")
    return textstats.bpe_merges(d, "text", k=5)


def bpe2_bpe_token_counts(spark, sf_dir):
    """Token counting under the learned BPE vocab
    (textstats.bpe_token_counts): learn the 5 merges, then one map-only
    corpus pass — explode words, apply the merge chain in codegen (no
    interpreted higher-order lambdas), map-side partial sum, one
    (doc_id, count) exchange.  NULL text → NULL, empty text → 0; the
    oracle replays the learning CTEs and the same replace chain."""
    d = _t(spark, sf_dir, "documents")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in textstats.bpe_merges(d, "text", k=5).collect()
    ]
    return textstats.bpe_token_counts(d, merges, "text", "doc_id")


def bpe3_bpe_merges_hybrid(spark, sf_dir):
    """Hybrid-tier BPE vocabulary induction
    (textstats.bpe_merges_hybrid) — same contract and output as bpe1,
    but the merge loop switches tiers on the distinct-word table's
    size: distributed rounds while it exceeds driver_rows (pruning
    fully-merged words each checkpoint), then ONE bounded collect and a
    driver-local Sennrich finish with site-local incremental pair
    counts (O(merge sites)/round — what makes k≈30k tokenizers
    practical; SCALE.md §bpe).  At fixture scale the collect happens
    immediately, so this entry oracle-checks the DRIVER tier against
    the same unrolled-CTE oracle bpe1 uses; tier equality at k=64 plus
    adjacent/overlapping-site property fuzz are pinned in pytest."""
    d = _t(spark, sf_dir, "documents")
    return textstats.bpe_merges_hybrid(d, "text", k=5)


def cp4_dedup_token_budget(spark, sf_dir):
    """Capstone composing the round-9 operators into the question a
    training run actually asks — "after dedup, how many tokens do I
    have per language?": quality-score (t3) → near-dup canonicalization
    keeping the best copy per cluster (d7) → BPE vocab learned ON THE
    DEDUPED corpus (bpe1 — learning on raw data would overweight
    duplicated text's pairs) → per-doc token counts (bpe2) → per-lang
    (n_docs, n_tokens).  Every stage is individually oracle-exact; this
    entry proves they compose deterministically (the cp1-cp3 contract).
    One oracle replays the whole chain: _d7_ctes + kept + the BPE
    rounds sourced FROM kept."""
    d = _t(spark, sf_dir, "documents")
    scored = textstats.quality_score(d).select("doc_id", "quality")
    pairs = dedup.ngram_jaccard_pairs_best(d, "doc_id", "text", k=8, threshold=0.2)
    canon = dedup.canonical_docs(scored, pairs, "doc_id", "quality")
    kept = (
        canon.where(F.col("kept"))
        .select("doc_id")
        .join(d.select("doc_id", "lang", "text"), "doc_id")
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in textstats.bpe_merges(kept, "text", k=5).collect()
    ]
    counts = textstats.bpe_token_counts(kept, merges, "text", "doc_id")
    return (
        counts.join(kept.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def d7_canonical_docs(spark, sf_dir):
    """Cluster canonicalization (dedup.canonical_docs): near-dup pairs →
    connected components → keep the highest-quality member per cluster
    (ties to the smallest doc_id), singletons passed through.  The
    "keep the best copy" ending of a dedup pipeline — near-dup cluster
    members DIFFER, so the keeper must be chosen by a quality signal
    (t3's composite score), not d1's arbitrary min-id.  Edges from the
    density-auto-selected exact Jaccard join; label join + one
    row_number window — both AQE-sized, no new shuffle shape."""
    d = _t(spark, sf_dir, "documents")
    scored = textstats.quality_score(d).select("doc_id", "quality")
    pairs = dedup.ngram_jaccard_pairs_best(d, "doc_id", "text", k=8, threshold=0.2)
    return dedup.canonical_docs(scored, pairs, "doc_id", "quality").select(
        "doc_id", "cluster_id", "quality", "kept"
    )


def st8_stream_dedup(spark, sf_dir):
    """Batch dual of the streaming exact-dedup ingest guard
    (streaming.events.dedup_stream): an at-least-once source redelivers
    rows byte-identically (Kafka replay / producer retry — modeled here
    by re-appending every third event), and the guard keeps one row per
    event_id.  On the stream this is dropDuplicatesWithinWatermark —
    seen-key state evicted past the watermark, so state is bounded by
    rate×delay, not stream length (duality tested in
    tests/test_streaming.py).  Copies are identical on EVERY column, so
    the batch keeper is deterministic and the oracle is one DISTINCT."""
    from maple_spark.streaming.events import dedup_stream

    e = _t(spark, sf_dir, "events")
    cols = ["event_id", "ts", "event_type", "value"]
    once = e.select(*cols)
    delivered = once.unionAll(once.where(F.col("event_id") % 3 == 0))
    return dedup_stream(delivered, ["event_id"]).select(
        "event_id",
        F.date_format("ts", TS_FMT).alias("ts"),
        "event_type",
        "value",
    )


def st7_cross_dedup_stream(spark, sf_dir):
    """Batch dual of the streaming cross-corpus ingest guard
    (dedup.cross_dedup_stream): row-local stateless banding on the
    arriving side + equi-joins against the static reference bucket/set
    tables — carry_sets=True pins the CARRY formulation, the plan that
    runs unchanged on an unbounded stream (stream/batch equality tested
    in tests/test_streaming.py; batch inputs otherwise take the round-12
    id-only formulation, which d6s driver-checks).  Output ≡ d6 (the
    oracle is shared verbatim); jaccard intersects 60-bit fingerprint
    sets, equal to shingle sets up to md5 collisions."""
    d = _t(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 2 == 1)
    ref = d.where(F.col("doc_id") % 2 == 0)
    return dedup.cross_dedup_stream(
        new, ref, "doc_id", "text", num_perm=64, bands=16, k=8,
        jaccard_threshold=0.2, carry_sets=True,
    )


def t5_hash_split(spark, sf_dir):
    """Deterministic md5-bucket train/valid/test split (80/10/10) — split
    assignment is content-stable and engine-portable, so the oracle
    verifies the split itself, not just row counts."""
    from maple_spark.pipelines import sampling

    d = _t(spark, sf_dir, "documents")
    return sampling.hash_split(d, "doc_id", 80, 10).select(
        "doc_id", "bucket", "split"
    )


def t6_quota_sample(spark, sf_dir):
    """Per-language quota sampling (cap 30 docs/lang by ascending doc_id)
    — the class-rebalancing primitive, deterministic rank window."""
    from maple_spark.pipelines import sampling

    d = _t(spark, sf_dir, "documents")
    return sampling.quota_sample(d, "lang", "doc_id", cap=30).select(
        "doc_id", "lang", "source"
    )


def t15_weighted_sample(spark, sf_dir):
    """Efraimidis-Spirakis A-Res weighted sampling (content-stable,
    distributable as a rank-filtered top-k — WindowGroupLimit partial
    top-k, no global sort): 100 documents drawn with probability
    proportional to length.  Extended oracle replays the hash-derived
    uniform and score exactly (xxh_il UDF)."""
    from maple_spark.pipelines import sampling

    d = _t(spark, sf_dir, "documents")
    return sampling.weighted_reservoir(
        d.select("doc_id", "n_chars"), "n_chars", k=100, id_col="doc_id"
    )


def t18_temperature_sample(spark, sf_dir):
    """Temperature (α = 0.5) mixture sampling over languages — the
    XLM-R-style multilingual rebalance: per-language quotas ∝ √n_lang
    of a 300-row budget, kept rows chosen by the content-stable md5
    draw.  sqrt keeps the weights IEEE-exact, so the whole operator has
    a value-exact DuckDB twin."""
    from maple_spark.pipelines import sampling

    d = _t(spark, sf_dir, "documents")
    return sampling.temperature_sample(
        d.select("doc_id", "lang"), "lang", "doc_id", alpha=0.5, budget=300
    )


def cp1_corpus_pipeline(spark, sf_dir):
    """Capstone composition — the full curation pass a training corpus
    gets, as ONE oracle-checked dataflow: quality-score filter (t3) →
    exact dedup keeping the lowest doc_id (d1) → deterministic
    train/valid/test hash split (t5) → per-(lang, split) quota (t6).
    Every stage is individually hash-verified; this entry proves they
    compose deterministically.  At 100 TB each stage is one map pass or
    one bounded shuffle — see SCALE.md per stage."""
    from maple_spark.pipelines import sampling

    d = _t(spark, sf_dir, "documents")
    scored = textstats.quality_score(d).select(
        "doc_id", "text", "lang", "quality"
    )
    kept = scored.where(F.col("quality") >= 0.5)
    w = Window.partitionBy("text").orderBy(F.col("doc_id").asc())
    deduped = (
        kept.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    split = sampling.hash_split(deduped, "doc_id", 80, 10)
    capped = sampling.quota_sample(split, ["lang", "split"], "doc_id", cap=40)
    return capped.select("doc_id", "lang", "split", "quality")


def t11_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag documents sharing any 13-word
    n-gram with the eval set (docs with doc_id % 50 == 0 stand in for the
    benchmark).  Corpus explodes once; benchmark gram set broadcasts; the
    corpus never shuffles (GPT-3-style n-gram overlap decontamination)."""
    from maple_spark.pipelines import curation

    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 50 == 0)
    return curation.decontaminate(d, bench, n=13)


def t12_repetition_stats(spark, sf_dir):
    """Within-document repetition signals (distinct word/bigram ratios,
    top-token share) — boilerplate/spam quality filters; map-only."""
    from maple_spark.pipelines import curation

    d = _t(spark, sf_dir, "documents")
    return curation.repetition_stats(d)


def t13_pii_scrub(spark, sf_dir):
    """PII count + mask (emails, phone literals) with portable
    character-class regexes; map-only.  The driver corpus is synthetic
    word salad (zero hits — asserted by the oracle too); planted-PII
    behavior is pytest-verified."""
    from maple_spark.pipelines import curation

    d = _t(spark, sf_dir, "documents")
    return curation.pii_scrub(d).select(
        "doc_id", "n_emails", "n_phones", F.md5("scrubbed_text").alias("scrub_md5")
    )


def t24_gopher_rules(spark, sf_dir):
    """The Gopher quality-rule gate (Rae et al. 2021 A1.1) — the
    doc-level heuristic filter production pipelines run FIRST, before
    any model-based scoring: word-count bounds, mean word length,
    symbol/bullet/ellipsis ratios, alpha-word ratio, stopword
    presence; per-rule signal columns + the composite keep flag.
    min_words/min_stop_hits are tuned to the synthetic corpus (10-99
    word docs) so the gate discriminates here; the other thresholds
    are the published defaults.  Map-only — zero exchanges at any
    corpus size."""
    from maple_spark.pipelines import curation

    d = _t(spark, sf_dir, "documents")
    return curation.gopher_quality_rules(d, min_words=30, min_stop_hits=1)


def cp2_curation_pipeline(spark, sf_dir):
    """Capstone #2 — the curation pass composed as ONE oracle-checked
    dataflow: quality filter (t3) → benchmark decontamination (t11) →
    repetition filter (t12) → domain mix (t14) → PII scrub (t13).
    Proves the round-3 curation operators compose deterministically;
    every stage is also individually hash-verified.  At 100 TB this is
    one corpus scan, one broadcast semi-join (benchmark grams), and one
    per-doc hit aggregation — see SCALE.md."""
    from maple_spark.pipelines import curation, sampling

    d = _t(spark, sf_dir, "documents")
    scored = textstats.quality_score(d).select("doc_id", "text", "lang", "source", "quality")
    kept = scored.where(F.col("quality") >= 0.4)
    bench = d.where(F.col("doc_id") % 50 == 0)
    # ONE linear scan: every filter stage appends its signal columns and
    # filters in place (with_repetition_stats / with_pii_scrub) instead of
    # projecting a stats frame and self-joining it back — the join-back
    # pattern re-executed the upstream lineage once per consumer (~3×
    # the corpus scan).  The only non-map stages left are the benchmark
    # gram semi-join (broadcast) and the contaminated-id distinct, whose
    # result is bounded by actual leakage and broadcasts into a left-anti.
    bad_ids = curation.contaminated_ids(kept, bench, n=13)
    clean = kept.join(F.broadcast(bad_ids), "doc_id", "left_anti")
    varied = curation.with_repetition_stats(clean).where(
        F.col("distinct_word_ratio") >= 0.2
    )
    mixed = sampling.domain_mix(
        varied, "source", "doc_id", weights={"src0": 1.0, "src1": 0.5}, default_weight=0.3
    )
    return curation.with_pii_scrub(mixed).select(
        "doc_id", "lang", "source", "quality", "n_emails",
        F.md5("scrubbed_text").alias("scrub_md5"),
    )


def cp6_incremental_ingest(spark, sf_dir):
    """Capstone #6 (round 12) — the INCREMENTAL production regime end
    to end, with every corpus-sized artifact persisted and ZERO refit
    on the increment path: the reference corpus (doc_id % 2 = 0 — the
    accepted crawl so far) is fit ONCE into two snapshots
    (dedup.build_reference_snapshot: LSH bucket + fingerprint-set
    tables; textstats.build_lm_snapshot(order=2): vocab + bigram +
    meta), and the new-crawl increment (doc_id % 2 = 1) then runs the
    production gate ordering — cheapest first so each stage bounds the
    next stage's input:

      1. t24 gopher rules (map-only, zero exchanges) — heuristic floor;
      2. t19s/t20s-shape LM scoring against the PERSISTED bigram model
         (total READ, vocab under the size-gated hint, backoff + OOV
         live because the model never saw the increment) — keep
         xent <= 3.46 (the corpus-tuned quality band);
      3. d6s-shape near-dup guard against the PERSISTED reference
         buckets (id-only band rows, candidate-bounded verify) — drop
         any increment doc with a verified jaccard >= 0.2 reference
         twin.

    Returns the admitted docs (doc_id, n_words, n_oov, xent).  The
    oracle replays all three stages in one statement from the shared
    t24/t20/d6 oracle pieces.  At 100 TB: stage 1 is a map, stage 2
    joins model tables that amortize across every increment, stage 3's
    explode is fixed-width id-only rows — the whole increment path
    scales with the INCREMENT, never the reference
    (INCREMENT_CURVE_r12 pins that curve for stage 3)."""
    d = _t(spark, sf_dir, "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    inc = d.where(F.col("doc_id") % 2 == 1)
    from maple_spark.pipelines import curation

    dsnap = _snapshot_root(sf_dir, "cp6_dedup_ref")
    lmsnap = _snapshot_root(sf_dir, "cp6_lm_ref")
    # the two reference snapshots are INDEPENDENT fits of the same ref
    # corpus — build them as two concurrent driver-thread jobs so the
    # second fit back-fills the executors the first one's stage tails
    # leave idle (optimization guide §2.6); at cluster scale this is
    # the same once-per-snapshot cost, just not serialized.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fd = pool.submit(
            dedup.build_reference_snapshot,
            ref, dsnap, "doc_id", "text", num_perm=64, bands=16, k=8,
        )
        fl = pool.submit(textstats.build_lm_snapshot, ref, lmsnap, order=2)
        fd.result(), fl.result()
    # the gopher gate is a row-local predicate, so gate IN PLACE with
    # text carried through (carry_cols) instead of joining kept ids
    # back to the increment — removes one increment scan and an
    # increment-sized join that was pure plumbing (round-12
    # optimization; at 100 TB stage 1 stays the map-only filter the
    # docstring promises)
    gated = (
        curation.gopher_quality_rules(
            inc, min_words=30, min_stop_hits=1, carry_cols=("text",)
        )
        .where("keep")
        .select("doc_id", "text")
    )
    # materialize the gated-and-LM-scored admission table ONCE: three
    # downstream consumers (the guard's band pass, its candidate-doc
    # semi-join + set build, and the final anti-join) each re-derived
    # the whole gopher-gate + model-join pyramid lineage before this —
    # the before-plan held 22 documents.parquet scans, 41 parquet scans
    # total (plans/r12/cp6_incremental_ingest_before.txt).  The
    # checkpoint is a
    # fixed-width (doc_id, n_words, n_oov, xent) table bounded by the
    # INCREMENT, recomputed from the parquet inputs on every run —
    # guide §3.3/§5 (materialize a multiply-consumed intermediate to
    # truncate the plan), not cross-run caching.
    scored = (
        textstats.lm_score(gated, lmsnap)
        .where(F.col("xent") <= 3.46)
        .transform(_reliable_or_local_ckpt)
    )
    # scored ids ⊆ gated ids ⊆ inc ids, so re-attaching text for the
    # guard needs only the inc scan + the id join (the decide-with-
    # small-rows / re-attach-payload-once pattern, guide §8)
    survivors = inc.join(scored.select("doc_id"), "doc_id")
    dups = (
        dedup.cross_dedup_stream(
            survivors, None, "doc_id", "text", num_perm=64, bands=16, k=8,
            jaccard_threshold=0.2, reference_snapshot=dsnap,
            carry_sets=False,
        )
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    return scored.join(dups, "doc_id", "left_anti").select(
        "doc_id", "n_words", "n_oov", "xent"
    )


def cp3_pretraining_ingest(spark, sf_dir):
    """Capstone #3 — the full pretraining-INGEST pass, the workload the
    north star names, composed as ONE oracle-checked dataflow over an
    arriving crawl: cross-corpus dedup against the existing corpus
    snapshot (d6: drop arriving docs that near-duplicate the reference,
    LSH candidates + exact-Jaccard verify) → benchmark decontamination
    (t11: drop docs sharing any 13-word n-gram with the eval set) →
    quality filter (t3) → per-language quota (t6) → sequence packing
    (t10: shard-parallel cumulative token offsets).  Exercises the
    composition the per-operator entries cannot: the dedup/decontam
    survivors feed the quota's rank windows and the packer's cumulative
    sums, so every downstream offset depends on every upstream drop.

    100 TB shape: the reference side's bucket/fingerprint tables are
    computed once per snapshot (see d6); the arriving corpus is scanned
    once for banding and once for curation signals (both map-side), the
    only non-map stages are the candidate equi-join, the bounded
    verify, the broadcast gram semi-join, and the per-(lang|shard)
    windows — no global sort, no unbounded broadcast.  Pack shards
    scale with input bytes (t10), so the cumulative sum stays
    shard-parallel at any size."""
    from maple_spark.pipelines import curation, sampling

    d = _t(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 2 == 1)  # the arriving crawl
    ref = d.where(F.col("doc_id") % 2 == 0)  # existing corpus snapshot
    # 1. decontamination-by-dedup against the snapshot (d6 semantics)
    #
    # The dup-id drop list is LAZILY localCheckpointed (round-12
    # optimization): survivors has TWO consumers (the 13-gram
    # contamination scan and the clean anti-join), and each re-derived
    # the whole banding + candidate + exact-verify lineage — the
    # before-plan held 19 documents.parquet scan mentions (plans/r12/
    # cp3_pretraining_ingest_before.txt).  The checkpoint is id-only
    # longs bounded by the dup RATE, materialized INSIDE the timed
    # execution (eager=False — cp3 stays out of CONSTRUCT_TIMED, the
    # bench still times the whole computation), recomputed from parquet
    # every run.  Guide §3.3/§5: materialize a multiply-consumed
    # intermediate; decide with small rows, re-attach by id join (§8).
    dup_ids = (
        dedup.cross_dedup_pairs(
            new, ref, "doc_id", "text",
            num_perm=64, bands=16, k=8, jaccard_threshold=0.2,
        )
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
        .transform(_reliable_or_local_ckpt_lazy)
    )
    # The drop lists are id-only longs whose size scales with the corpus
    # dup/contamination RATE — un-hinted so AQE broadcasts them while
    # small and falls back to a shuffled anti-join when a pathological
    # corpus makes them huge (forcing F.broadcast here would be the same
    # trap round 5 removed from verify_jaccard).
    survivors = new.join(dup_ids, "doc_id", "left_anti")
    # 2. benchmark decontamination (eval set = doc_id % 50 == 0, as t11)
    bench = d.where(F.col("doc_id") % 50 == 0)
    bad_ids = curation.contaminated_ids(survivors, bench, n=13)
    clean = survivors.join(bad_ids, "doc_id", "left_anti")
    # 3. quality filter (t3 signals, map-only)
    kept = (
        textstats.quality_score(clean)
        .select("doc_id", "text", "lang", "quality")
        .where(F.col("quality") >= 0.4)
    )
    # 4. per-language quota (t6)
    capped = sampling.quota_sample(kept, "lang", "doc_id", cap=40)
    # 5. sequence packing (t10) over the curated stream
    n_tokens = F.size(
        F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    ).cast("bigint")
    shard = (F.col("doc_id") % _pack_shards(d)).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    toks = capped.select(
        "doc_id", "lang", "quality",
        shard.alias("shard"), n_tokens.alias("n_tokens"),
    )
    return toks.withColumn(
        "start_tok", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).select(
        "doc_id", "lang", "quality", "shard", "n_tokens",
        F.floor(F.col("start_tok") / PACK_CAPACITY).cast("bigint").alias("pack_id"),
        (F.col("start_tok") % PACK_CAPACITY).cast("bigint").alias("pack_offset"),
    )


def t14_domain_mix(spark, sf_dir):
    """Weighted per-source subsample (corpus mixing): content-stable md5
    draw per (source, doc_id) against per-domain target fractions —
    deterministic, map-only, re-run-stable.  The oracle computes the same
    draw, so the mix itself is hash-verified."""
    from maple_spark.pipelines import sampling

    d = _t(spark, sf_dir, "documents")
    return sampling.domain_mix(
        d,
        "source",
        "doc_id",
        weights={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_weight=0.1,
    ).select("doc_id", "source", "lang")


def st4_quota_admit(spark, sf_dir):
    """Batch dual of the streaming per-key admission cap
    (streaming/stateful.quota_admit_stream, equality-tested in
    test_streaming): first 25 events per event_type by (ts, event_id) —
    the per-source rate-cap primitive for firehose ingest."""
    from maple_spark.pipelines import sampling

    e = _t(spark, sf_dir, "events")
    return sampling.quota_sample(
        e, "event_type", ["ts", "event_id"], cap=25
    ).select("event_id", "event_type")


def st5_stream_join(spark, sf_dir):
    """Batch dual of the stream-stream event-time interval join
    (streaming/events.join_streams; stream/batch equality and outer-mode
    null-padding are equality-tested in test_streaming): each view event
    joined to the same user's purchases within the following 30 minutes.
    The streaming plan differs only by watermarks — identical condition,
    so this oracle also pins the streaming semantics."""
    from maple_spark.streaming.events import join_streams

    e = _t(spark, sf_dir, "events")
    out = join_streams(
        e.where(F.col("event_type") == "view"),
        e.where(F.col("event_type") == "purchase"),
        key="user_id",
        within="30 minutes",
    )
    return out.select(
        "user_id",
        F.date_format("l_ts", TS_FMT).alias("l_ts"),
        F.date_format("r_ts", TS_FMT).alias("r_ts"),
        "l_value",
        "r_value",
    )


def st6_hll_stream(spark, sf_dir):
    """Batch dual of the streaming windowed-HLL register maintenance
    (streaming/events.hll_registers_stream; stream/batch register
    equality tested in test_streaming): per-hour distinct-user estimates
    read off the (window, register) table with the a15 estimator.  The
    mergeable-sketch firehose pattern — state ≤ 2^p rows per live
    window, estimate is a read-time projection.  Extended oracle replays
    registers + estimator exactly (xxh_l UDF)."""
    from maple_spark.functions.sketch import hll_estimate
    from maple_spark.streaming.events import hll_registers_stream

    e = _t(spark, sf_dir, "events")
    regs = hll_registers_stream(
        e, col="user_id", p=12, window_duration="1 hour", watermark=None
    )
    return hll_estimate(regs, ["window_start"], p=12).select(
        F.date_format("window_start", TS_FMT).alias("hour"),
        F.col("approx_n").alias("approx_users"),
    )


def sim1_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-5 for the first 10 vectors as queries."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    return similarity.cosine_topk(e, q, k=5)


def sim6_quantized_topk(spark, sf_dir):
    """Scalar-quantized (int8) ANN: coarse top-20 per query by exact-
    integer cosine over max-abs-quantized levels (4x less scan/shuffle
    than float32 at scale — the quantized corpus persists like the
    dedup reference snapshot), then full-precision exact rerank to
    top-5.  Quantization is floor(x*127/max|x| + 0.5) — exact integer
    arithmetic in doubles, so the oracle replays it bit-identically."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    return similarity.quantized_topk(e, q, k=5, rerank_mult=4)


def sim2_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs — exact, via the blocked
    gram-matrix cogroup join (BLAS kernel per block pair; recall and
    precision 1.0 by construction, no CartesianProduct in the plan;
    equality-tested against the all-pairs oracle in test_pipelines)."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dup(e, threshold=0.4)


def sim3_lsh_topk(spark, sf_dir):
    """SRP-LSH bucketed ANN with Hamming-1 multi-probe (rows-only:
    bucketing depends on xxhash64; recall-vs-brute-force is pytest-tested
    in test_pipelines)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    return similarity.lsh_topk(e, q, k=5, num_planes=8, multi_probe=True)


def sim4_ivf_topk(spark, sf_dir):
    """IVF ANN: deterministic-Lloyd k-means coarse quantizer +
    probe-and-rerank.  Decimal-exact centroid means and tie-stable argmin
    make the whole operator reproducible in pure SQL — the oracle unrolls
    the same two Lloyd rounds (value-exact at sf0.01)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    return similarity.ivf_topk(e, q, k=5, n_cells=8, n_probe=3)


def _reap_snapshot_dirs() -> None:
    """Remove this process's pid-keyed snapshot dirs (atexit) plus any
    sibling left by a process that no longer exists — short-lived pytest
    / driver-gate runs would otherwise accumulate unbounded /tmp garbage
    (review finding, round 10).  Foreign dirs are only reaped when BOTH
    dead-pid AND >1 h old: the liveness probe is check-then-delete, and
    without the age guard a dir created moments ago by a new process
    that recycled the probed pid could be swept out from under it
    (review finding, round 11).  A dir whose pid was recycled by an
    unrelated long-lived process is never reaped here — bounded-size
    leak, cleared by the owner's own atexit or /tmp lifecycle."""
    import os
    import shutil
    import time

    base = "/tmp/maple_snapshots"
    try:
        entries = os.listdir(base)
    except OSError:
        return
    now = time.time()
    for d in entries:
        pid_s = d.rsplit("-", 1)[-1]
        if not pid_s.isdigit():
            continue
        pid = int(pid_s)
        path = os.path.join(base, d)
        if pid == os.getpid():
            shutil.rmtree(path, ignore_errors=True)
            continue
        try:
            os.kill(pid, 0)
            continue  # alive
        except ProcessLookupError:
            pass
        except OSError:
            continue  # can't probe — leave it
        try:
            old = now - os.stat(path).st_mtime > 3600
        except OSError:
            continue
        if old:
            shutil.rmtree(path, ignore_errors=True)


_SNAPSHOT_CLEANUP_REGISTERED = False


def _snapshot_root(sf_dir: str, name: str) -> str:
    """Scratch path for a per-fixture snapshot build, keyed on the
    ABSOLUTE sf dir (two same-named fixture dirs with different data
    never share a path) AND the pid: the probe entries overwrite-then-
    read, so two processes running the same entry concurrently (pytest
    + a driver gate) must not race one directory (review finding,
    round 10).  The pid dir is removed at interpreter exit, and dirs
    from dead pids are reaped on first use, so /tmp footprint is
    bounded by live processes, not process history."""
    import atexit
    import hashlib
    import os

    global _SNAPSHOT_CLEANUP_REGISTERED
    if not _SNAPSHOT_CLEANUP_REGISTERED:
        _SNAPSHOT_CLEANUP_REGISTERED = True
        _reap_snapshot_dirs()  # sweep leftovers from dead processes now
        atexit.register(_reap_snapshot_dirs)  # and our own dir on exit

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return os.path.join(
        "/tmp/maple_snapshots",
        f"{os.path.basename(sf_dir.rstrip('/'))}-{key}-{os.getpid()}",
        name,
    )


def sim4s_ivf_snapshot_topk(spark, sf_dir):
    """The PRODUCTION shape of sim4 — FAISS-style train/add persisted
    once per corpus snapshot (similarity.build_ivf_snapshot: assignment
    + centroid + pinned-params parquet), probe + in-cell exact rerank
    per query batch (measured 6.5x amortization at 100x,
    ANN_SNAPSHOT_AB_r09.json) — made driver-checkable: this entry
    builds the snapshot and searches WITH ivf_snapshot=, so the
    externally-verified plan is the snapshot-read one a 100 TB
    deployment actually runs (staleness rows-guard included).  Same
    geometry as sim4_ivf_topk; the oracle is shared verbatim (the
    parquet roundtrip of assignments/centroids is lossless)."""
    e = _t(spark, sf_dir, "embeddings")
    snap = _snapshot_root(sf_dir, "ivf")
    similarity.build_ivf_snapshot(e, snap, n_cells=8, lloyd_iters=2)
    q = e.where(F.col("vec_id") < 10)
    return similarity.ivf_topk(
        e, q, k=5, n_cells=8, n_probe=3, ivf_snapshot=snap
    )


def sim6s_quantized_snapshot_topk(spark, sf_dir):
    """sim6's amortized form: the int8 corpus persisted as
    array<tinyint> parquet (the actual 4x scan win;
    similarity.build_quantized_snapshot, 2.2x amortization measured at
    100x) and the coarse search reading THAT table — the float corpus
    is touched only by the candidate-bounded exact rerank.  Same
    contract as sim6_quantized_topk; oracle shared verbatim (tinyint
    levels widen back to the identical integer-valued doubles)."""
    e = _t(spark, sf_dir, "embeddings")
    snap = _snapshot_root(sf_dir, "quantized")
    similarity.build_quantized_snapshot(e, snap)
    q = e.where(F.col("vec_id") < 10)
    return similarity.quantized_topk(
        e, q, k=5, rerank_mult=4, quantized_snapshot=snap
    )


def d6s_snapshot_guard(spark, sf_dir):
    """The amortized ingest guard: dedup.build_reference_snapshot
    persists the reference corpus's LSH bucket + fingerprint-set tables
    ONCE (params pinned in meta.parquet; ~11x per-increment speedup at
    100x, SNAPSHOT_AMORT_r09.json), and cross_dedup_stream(ref_df=None,
    reference_snapshot=...) guards the increment against the parquet
    tables — no reference re-scan.  carry_sets=False pins the round-12
    id-only batch formulation (_cross_dedup_batch_joins: fixed-width
    band rows through the bucket join, sets attached candidate-bounded
    — the INCREMENT_CURVE_r11 250k-cliff fix; the half-corpus increment
    this entry runs is exactly the over-32MiB regime the API's size
    router would pick it for, INCREMENT_CURVE_r12).  Output ==
    d6_cross_dedup on the same parity split (equality-tested in
    pytest); oracle shared verbatim with d6/st7."""
    d = _t(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 2 == 1)
    ref = d.where(F.col("doc_id") % 2 == 0)
    snap = _snapshot_root(sf_dir, "dedup_ref")
    dedup.build_reference_snapshot(
        ref, snap, "doc_id", "text", num_perm=64, bands=16, k=8
    )
    return dedup.cross_dedup_stream(
        new, None, "doc_id", "text", num_perm=64, bands=16, k=8,
        jaccard_threshold=0.2, reference_snapshot=snap, carry_sets=False,
    )


def sim5_semdedup(spark, sf_dir):
    """SemDeDup cluster-then-prune semantic dedup (Abbas et al. 2023):
    deterministic-Lloyd cells (the sim4 quantizer) + per-cell gram-matrix
    pruning — drop any doc whose cell has a lower-id neighbor with cosine
    ≥ 0.4, report the smallest such shadow as dup_of.  The SQL oracle
    unrolls the same two Lloyd rounds and the same pairwise rule."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.semdedup(e, threshold=0.4, n_cells=8, lloyd_iters=2)


def mm1_media_features(spark, sf_dir):
    """Multimodal plumbing: binary content column + mapInPandas feature
    extraction (decode stubbed deterministically — container has no codecs).
    n_bytes/n_frames are SQL-checkable; feat_hash covered in pytest."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(d)
    feats = multimodal.extract_features(media, decode_stub=True)
    return feats.select("media_id", "modality", "n_bytes", "n_frames")


def mm3_embed_stub(spark, sf_dir):
    """Arrow-batched embedding inference over documents (encoder stubbed
    deterministically — no model runtime in the container; the mapInPandas
    batching, array<float> schema, and ANN handoff are the real pipeline).
    Rows-only check: vectors are Python-side md5-seeded floats with no SQL
    twin; determinism + unit-norm + ANN-composability are pytest-verified."""
    from maple_spark.pipelines.inference import embed_texts

    d = _t(spark, sf_dir, "documents")
    emb = embed_texts(d, dim=16)
    return emb.select(
        "doc_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ),
            4,
        ).alias("sq_norm"),
    )


def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS-filtered priority counts (semi join against
    a date-windowed fact subset)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    # (TPC-H's l_commitdate < l_receiptdate columns don't exist in the
    # driver schema; the EXISTS predicate is a quantity filter instead)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45).select(
        "l_orderkey"
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts —
    LEFT JOIN + two stacked aggregations (count per customer, then
    customers per count)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: suppliers achieving the global-max revenue —
    aggregate view + max-of-aggregate filter (broadcast scalar)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    revenue = li.groupBy("l_suppkey").agg(F.sum(rev).alias("total_rev"))
    max_rev = revenue.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_rev") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .select(
            "s_suppkey", "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: per-part correlated average (lineitems below 50%
    of their part's avg quantity) — decorrelated as a pre-aggregated join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
         / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(avg_qty, li["l_partkey"] == F.col("ap"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: customers with above-average balance and no
    orders — scalar-avg subquery + anti join + substring grouping."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
         / F.count("c_acctbal")).alias("ab")
    )
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == o["o_custkey"], "left_anti")
    )
    return (
        rich.groupBy(F.substring(F.col("c_name"), 10, 1).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: the same dimension joined twice under different
    aliases (supplier-nation × customer-nation pairs) — alias resolution +
    join-pair filtering."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    pair |= (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (adapted: no partsupp table in the driver schema):
    profit per supplier-nation per year, profit = revenue − tax cost,
    for parts whose type contains 'STEEL'."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type").like("%STAND%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    ) - F.col("l_extendedprice").cast("decimal(18,2)") * F.col("l_tax").cast(
        "decimal(18,2)"
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-items revenue per customer, top 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    agg = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return (
        agg.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 20)
    )


def fn1_funnel(spark, sf_dir):
    """Event-funnel analysis: per user, first view → first click after
    that view → first purchase after that click; count users reaching
    each stage.  Classic product-analytics operator, expressed as ordered
    min-aggregates (one shuffle by user)."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id", F.col("ts").alias("tc"))
    first_click = (
        per_user.join(clicks, on="user_id", how="left")
        .where(F.col("tc") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("tc").alias("t_click"))
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("tp")
    )
    first_purchase = (
        first_click.join(purchases, on="user_id", how="left")
        .where(F.col("tp") > F.col("t_click"))
        .groupBy("user_id", "t_view", "t_click")
        .agg(F.min("tp").alias("t_purchase"))
    )
    base = per_user.where(F.col("t_view").isNotNull())
    return spark.createDataFrame(
        [(0,)], "dummy int"
    ).select(
        F.lit(base.count()).cast("bigint").alias("n_viewed"),
        F.lit(first_click.count()).cast("bigint").alias("n_clicked_after_view"),
        F.lit(first_purchase.count()).cast("bigint").alias("n_purchased_after_click"),
    )


def q2_groupwise_max(spark, sf_dir):
    """Correlated-subquery shape (TPC-H Q2's per-group min): richest
    customer per nation.  The reference parses but cannot execute
    correlated subqueries (Environment chaining unfinished, E10); here the
    standard decorrelation — a window max filter — with the oracle written
    AS the correlated subquery to prove semantic equivalence."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    return (
        c.withColumn("max_bal", F.max("c_acctbal").over(w))
        .where(F.col("c_acctbal") == F.col("max_bal"))
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
    )


def aj1_asof_join(spark, sf_dir):
    """As-of join (absent from the reference, J8): each click event gets
    the same user's most recent prior-or-simultaneous purchase.  Custom
    operator via union+window carry — one shuffle, no range explosion."""
    from maple_spark.operators.asof import as_of_join

    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = as_of_join(
        clicks, purchases, key="user_id", left_time="ts", right_time="ts",
        payload_cols=["purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("ts"),
        "purchase_value",
    )


def rj1_range_join(spark, sf_dir):
    """Range/band join (absent from the reference, J8): customers bucketed
    into balance tiers via a broadcast non-equi join."""
    from maple_spark.operators.asof import range_join

    c = _t(spark, sf_dir, "customer")
    bands = spark.createDataFrame(
        [
            ("negative", -100000.0, 0.0),
            ("low", 0.0, 3000.0),
            ("mid", 3000.0, 7000.0),
            ("high", 7000.0, 100000.0),
        ],
        "tier string, lo double, hi double",
    )
    out = range_join(c, bands, "c_acctbal")
    return out.select("c_custkey", "c_acctbal", "tier")


def rj2_interval_overlap(spark, sf_dir):
    """Interval×interval overlap join (J8 family): concurrent-session
    pairs across users.  Sessions come from the gap-break window
    formulation (30-minute gap, RANGE-cumulative break sum so timestamp
    ties are order-independent); overlapping pairs come from the BINNED
    equi-join (operators/asof.interval_overlap_join) — never a theta
    join.  Output: one row per overlapping (session_a, session_b) pair
    with user_a < user_b and the overlap length in seconds."""
    from maple_spark.operators.asof import interval_overlap_join

    e = _t(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(wu)
    g = e.select("user_id", "ts").withColumn(
        "brk", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    )
    sess = (
        g.withColumn("sid", F.sum("brk").over(wu).cast("int"))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    )
    a = sess.select(
        F.col("user_id").alias("user_a"),
        F.col("sid").alias("sid_a"),
        F.col("t0").alias("a0"),
        F.col("t1").alias("a1"),
    )
    b = sess.select(
        F.col("user_id").alias("user_b"),
        F.col("sid").alias("sid_b"),
        F.col("t0").alias("b0"),
        F.col("t1").alias("b1"),
    )
    pairs = interval_overlap_join(
        a, b, "a0", "a1", "b0", "b1",
        extra_cond=F.col("user_a") < F.col("user_b"),
    )
    return pairs.select(
        "user_a",
        "sid_a",
        "user_b",
        "sid_b",
        (
            F.unix_micros(F.least(F.col("a1"), F.col("b1")))
            - F.unix_micros(F.greatest(F.col("a0"), F.col("b0")))
        ).alias("overlap_us"),
    )


def enc1_encoding_report(spark, sf_dir):
    """FileAnalyzer parity (storage/FileAnalyzer.java:48-238): per-column
    cardinality/run/sortedness report + encoding choice over lineitem's
    layout-sensitive columns.  Rows-only: uses approx_count_distinct and
    physical row order."""
    from maple_spark.sources import analyze_encoding

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    return analyze_encoding(li)


def hh1_heavy_hitters(spark, sf_dir):
    """Heavy-hitter detection: top-5 most frequent (event_type, user_id)
    pairs per event_type — groupBy + per-group partial top-k (the exact
    formulation; at extreme cardinality switch to count-min sketch /
    ``DataFrame.freqItems``, the documented approximate path)."""
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("user_id").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 5)
        .select("event_type", "user_id", "n", "rk")
    )


def mm2_frame_stats(spark, sf_dir):
    """Frame sampling (row-expanding mapInPandas): per-frame stats are
    deterministic functions of the content bytes, so the fan-out logic
    itself is oracle-checked (frame bytes stay binary-internal)."""
    from maple_spark.pipelines import multimodal as mm

    d = _t(spark, sf_dir, "documents")
    frames = mm.sample_frames(mm.documents_as_media(d), every_nth=2)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.length("frame_bytes").cast("bigint").alias("frame_len"),
    )


def st1_hourly_agg(spark, sf_dir):
    """Streaming-shaped tumbling rollup in its batch binding (same logical
    plan as the readStream path — see maple_spark.streaming.events)."""
    e = _t(spark, sf_dir, "events")
    out = hourly_agg_batch(e)
    return out.select(
        F.date_format("hour", TS_FMT).alias("hour"),
        "event_type",
        "n_events",
        "sum_value",
    )


def st2_sessionize(spark, sf_dir):
    """Session windows (30 min gap) per user — batch binding of the
    session_window operator."""
    e = _t(spark, sf_dir, "events")
    out = sessionize(e, gap="30 minutes")
    return out.select(
        F.date_format("session_start", TS_FMT).alias("session_start"),
        F.date_format("session_end", TS_FMT).alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


def j3_sort_merge_join(spark, sf_dir):
    """J3: large-large equi-join where broadcast is disabled via hint so
    Spark uses shuffle/sort-merge — the reference's SortMergeJoinNode
    made real (it requires pre-sorted inputs and conjunctive equality,
    plans/SortMergeJoinNode.java:42-60; Spark sorts/shuffles itself)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    joined = li.hint("merge").join(o, li["l_orderkey"] == o["o_orderkey"])
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        decimal_sum("l_quantity", "sum_qty", 2),
    )


def s2_column_pruned_scan(spark, sf_dir):
    """S2 columnar scan with late materialization: a 2-column projection
    over the 11-column lineitem must read only those Parquet column chunks
    (ReadSchema assertion in tests/test_plan_shape.py)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_extendedprice").where(
        F.col("l_extendedprice") > 90000
    )


def e4_boolean_ops(spark, sf_dir):
    """E4 n-ary AND/OR/NOT (BooleanOperator.java) with 3VL over derived
    NULLs: NOT(NULL > x) must not become TRUE."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "maybe_price", F.nullif(F.col("o_totalprice"), F.lit(0.0))
    )
    cond = (
        (F.col("o_orderpriority") == "1-URGENT")
        | (F.col("o_orderpriority") == "2-HIGH")
    ) & ~(F.col("maybe_price") < 200000) & (F.col("o_orderstatus") != "P")
    return o.where(cond).select("o_orderkey", "o_orderpriority", "maybe_price")


def sql_dialect(spark, sf_dir):
    """§3 SQL entry point: the same engine surface through spark.sql via
    the MapleEngine catalog (NanoDBServer.doCommands analog)."""
    from maple_spark.engine import MapleEngine

    eng = MapleEngine(spark, sf_dir, tables=("orders", "customer"))
    return eng.sql(
        """
        SELECT o.o_orderpriority AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'AUTOMOBILE'
        GROUP BY o.o_orderpriority
        """
    )


def udf_normalize(spark, sf_dir):
    """§2.9 UDF surface: Arrow-vectorized pandas_udf text normalization
    (FunctionDirectory.addFunction analog, registered for SQL too)."""
    from maple_spark.functions.udf import normalize_text, register_all

    register_all(spark)
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        normalize_text(F.col("text")).alias("norm_text"),
        F.length(normalize_text(F.col("text"))).cast("bigint").alias("norm_len"),
    )


def json_props(spark, sf_dir):
    """Extension: JSON extraction from the events.props column (the
    semi-structured path a real event pipeline needs)."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k_val"),
    ).where(F.col("event_id") < 2000)


def e14_try_functions(spark, sf_dir):
    """ANSI error-safe arithmetic/casts: the reference leaves
    divide-by-zero an open TODO (expressions/ArithmeticOperator.java:206
    "How to handle divide-by-zero?"); this engine answers it explicitly —
    ANSI mode (Spark 4 default) makes raw division THROW, and try_divide/
    try_cast give the NULL-on-error alternative.  DuckDB oracle spells the
    same semantics with NULLIF and TRY_CAST."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.col("l_quantity")
        ).alias("div_by_zero"),  # always NULL, never an error
        # no rounded float-division column here: round() of a double that
        # ties at the target digit is engine-dependent (HALF_UP vs
        # round-half-even) — the try_* semantics don't need it
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),  # NULL
        F.col("l_quantity").cast("string").try_cast("double").alias(
            "qty_roundtrip"
        ),
    )


def vnt1_variant_extract(spark, sf_dir):
    """VARIANT (Spark 4 semi-structured type): parse the props JSON once
    into a binary variant, then typed-path extraction — at scale this
    beats per-access get_json_object (one parse, shredded binary reuse)
    and keeps schema drift out of the table schema.  Aggregates the
    extracted key per event_type to force the whole parse+extract path."""
    e = _t(spark, sf_dir, "events")
    v = e.select(
        "event_id",
        "event_type",
        F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("k_val"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("k_val").cast("bigint")).alias("sum_k"),
        F.min("k_val").alias("min_k"),
        F.max("k_val").alias("max_k"),
    )


def ck1_constraints(spark, sf_dir):
    """TableSchema constraint validation (relations/TableSchema.java): PK
    uniqueness + FK referential integrity as distributed checks, reported
    as one summary row (0s ⇒ schema holds on the driver data)."""
    from maple_spark.constraints import fk_violations, pk_violations

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    pk_dup = pk_violations(li, ["l_orderkey", "l_linenumber"]).count()
    fk_orphan = fk_violations(li, ["l_orderkey"], o, ["o_orderkey"]).count()
    fk_orphan2 = fk_violations(o, ["o_custkey"], c, ["c_custkey"]).count()
    return spark.createDataFrame(
        [(pk_dup, fk_orphan, fk_orphan2)],
        "pk_dup_lineitem bigint, fk_orphan_lineitem bigint, fk_orphan_orders bigint",
    )


def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: join + CASE-WHEN conditional aggregation (the
    pivot-style pattern; both branches computed in one pass)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1994-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    hi = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(hi).cast("bigint").alias("high_line_count"),
            F.sum(1 - hi).cast("bigint").alias("low_line_count"),
        )
    )


def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 shape: conditional revenue ratio (CASE inside SUM over a
    join; single aggregate, no second pass)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1996-09-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape: semi-join against a GROUP BY ... HAVING subquery
    (the decorrelated IN-aggregate pattern the reference stubs, E8)."""
    li = _t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(big_orders, o["o_orderkey"] == big_orders["l_orderkey"], "left_semi")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice")
    )


def q19_disjunctive_pushdown(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicate over a join — exercises
    disjunction pushdown/CNF handling in the optimizer."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 15)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity").between(10, 25)))
        | ((F.col("p_size") > 40) & (F.col("l_quantity") > 40))
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return joined.where(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: national market share — one nation's revenue share
    of a region's market per year.  Dimension chain customer→nation→region
    bounds the market; a second nation alias names the supplier side.
    All dims broadcast; the only shuffles are lineitem⋈orders and the
    final per-year aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    s = _t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("s_nk"))
    )
    per_year = joined.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        F.coalesce(
            F.sum(F.when(F.col("supp_nation") == "NATION_1", rev)).cast("double"),
            F.lit(0.0),
        ).alias("nation_rev"),
        F.sum(rev).cast("double").alias("total_rev"),
    )
    return per_year.select(
        "o_year",
        "nation_rev",
        "total_rev",
        (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
    )


def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose inventory value exceeds a fraction of
    the global total — GROUP BY + HAVING against a scalar-aggregate
    subquery (the driver schema has no partsupp; shipped value
    l_extendedprice·l_quantity from suppliers in two nations stands in
    for ps_supplycost·ps_availqty)."""
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    filtered = li.join(
        F.broadcast(
            s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
                "s_suppkey"
            )
        ),
        li["l_suppkey"] == F.col("s_suppkey"),
    )
    per_part = filtered.groupBy("l_partkey").agg(
        F.sum(value).cast("double").alias("part_value")
    )
    # TPC-H scales the HAVING fraction by 1/SF; the scale-free equivalent
    # is "parts worth more than 2x the average part" — result cardinality
    # stays stable as the corpus grows
    total = filtered.agg(
        (
            F.sum(value).cast("double")
            / F.countDistinct("l_partkey")
            * 2.0
        ).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


def q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    excluding a NOT-IN supplier set — the part/supplier relationship comes
    from distinct (l_partkey, l_suppkey) pairs (no partsupp table);
    negative-balance suppliers stand in for the complaints filter."""
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .dropDuplicates(["l_partkey", "l_suppkey"])
    )
    complaints = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(complaints), ps["l_suppkey"] == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), ps["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_excess_shipments(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who dominate shipments of a named part
    family — nested IN-subqueries decorrelated into two aggregate joins
    (per-pair quantity vs a fraction of the per-part total)."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    bolt_li = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    per_pair = bolt_li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty_ps")
    )
    per_part = bolt_li.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty_total")
    )
    heavy = (
        per_pair.join(per_part, F.col("l_partkey") == F.col("tp"))
        .where(F.col("qty_ps") > 0.3 * F.col("qty_total"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
    )


def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who alone flagged a multi-supplier
    order — EXISTS (another supplier on the order) + NOT EXISTS (another
    supplier also flagged) over the same fact table; the driver schema
    has no receipt/commit dates so l_returnflag='R' marks a line
    "late".  Exercises semi+anti joins with non-equi residuals."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    ).alias("l2")
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3"))
        .alias("l3")
    )
    asian_supp = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name")
    )
    flagged = (
        l1.join(F.broadcast(asian_supp), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l1.l_orderkey") == o["o_orderkey"])
    )
    with_other = flagged.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("k2"))
        & (F.col("sk2") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    sole_blamed = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("k3"))
        & (F.col("sk3") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    return sole_blamed.groupBy("s_suppkey", "s_name").agg(
        F.count(F.lit(1)).alias("numwait")
    )


def a9_cube(spark, sf_dir):
    """A9 extension: CUBE over two dims with grouping_id level tags."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            decimal_sum("o_totalprice", "sum_price", 2),
            F.grouping_id().cast("bigint").alias("gid"),
        )
    )


def a10_percentiles(spark, sf_dir):
    """Exact continuous percentiles (median/p90) per group — the reference
    has no percentile support; this is the ANSI percentile_cont surface.
    Exact (not approx) so the DuckDB quantile_cont oracle matches."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("o_totalprice"), F.lit(0.9)).alias("p90"),
        F.min("o_totalprice").alias("p0"),
        F.max("o_totalprice").alias("p100"),
    )


def a9_grouping_sets(spark, sf_dir):
    """A9 extension: explicit GROUPING SETS (the general form rollup/cube
    specialize).  Same partial+final hash-agg plan as a plain groupBy —
    Spark expands the sets map-side, so each input row is aggregated once
    per set without re-scanning."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        decimal_sum("l_quantity", "sum_qty", 2),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


def w2_window_lead_movavg(spark, sf_dir):
    """Analytic-window surface beyond w1: lead/lag offsets, first_value,
    frame-bounded moving average, ntile/percent_rank/cume_dist.  The
    moving average is SUM(decimal)/COUNT over an explicit ROWS frame so
    both engines compute the identical exact sum before one FP divide."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w4 = w.rowsBetween(-3, 0)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.lag("o_totalprice", 2).over(w).alias("prev2_price"),
        F.first("o_orderkey").over(w).alias("first_key"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(38,2)")).over(w4).cast("double")
            / F.count(F.lit(1)).over(w4)
        ).alias("movavg4"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def w3_range_frame(spark, sf_dir):
    """Time-based RANGE window frame (vs w2's ROWS frames): per-customer
    trailing-90-day spend.  Spark range frames need a numeric order key,
    so the date becomes epoch seconds (UTC session) and the frame is
    [-90*86400, 0]; DuckDB orders by the DATE with an INTERVAL frame —
    identical frames because RANGE includes all peers of a tied date,
    making the decimal-exact sum order-independent.  At scale this is one
    shuffle on o_custkey; frames never cross partitions."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 3000)
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_90d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("orders_90d"),
    )


def w4_rank_distribution(spark, sf_dir):
    """Distribution window functions completing the §2.5 surface:
    percent_rank / cume_dist / ntile per nation over customer balances.
    Ratios ship unrounded: (rank-1)/(n-1) over exact ints is IEEE-
    identical across engines, while round-to-6 hits exact halves where
    Spark (HALF_UP) and DuckDB (half-even) disagree.
    One shuffle on the partition key; every function is rank-arithmetic
    over the partition-local sort, so the plan is identical in shape to
    w1.  Ties: ntile is only deterministic under a total order, so the
    sort key is (balance, custkey)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


def pv1_pivot(spark, sf_dir):
    """PIVOT: order counts + exact price sums per priority, one column set
    per order status.  Values are enumerated explicitly — at scale the
    implicit form would first run a distinct over the pivot column; pinning
    the list keeps this a single pass with a fixed schema."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.col("F_sum_price").alias("sum_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
        F.col("O_sum_price").alias("sum_o"),
        F.coalesce(F.col("P_n"), F.lit(0)).alias("n_p"),
        F.col("P_sum_price").alias("sum_p"),
    )


def ts3_hierarchical_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup: hour buckets are
    aggregated ONCE from raw events, then day re-aggregates the hourly
    partials and month the daily ones — the mergeable-partial pattern
    that makes multi-granularity rollups O(buckets), never a second raw
    scan (TimescaleDB continuous aggregates / OLAP cube refresh do
    exactly this).  Sums stay DECIMAL through every level so the
    re-aggregation is order-independent and matches the oracle exactly;
    the cast to double happens once, at the edge."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", F.col("bucket")).alias("bucket"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("s").alias("s"))
    monthly = daily.groupBy(
        F.date_trunc("month", F.col("bucket")).alias("bucket"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("s").alias("s"))

    def leveled(df, tag):
        # bucket rendered via TS_FMT like st1/st5: timestamp columns
        # otherwise reach pandas as datetime64[ns] vs the oracle's [us]
        return df.select(
            F.lit(tag).alias("granularity"),
            F.date_format("bucket", TS_FMT).alias("bucket_start"),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("s").cast("double").alias("sum_value"),
        )

    return (
        leveled(hourly, "hour")
        .unionByName(leveled(daily, "day"))
        .unionByName(leveled(monthly, "month"))
    )


def ts1_gapfill(spark, sf_dir):
    """Time-series gap-fill: zero-fill every (hour, event_type) cell over
    the full observed range — the densification step before charting or
    windowed model features.  The hour grid comes from sequence() over the
    1-row min/max agg and the type list is a broadcast dim, so the only
    real shuffle is the hourly pre-aggregation itself."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = e.select("event_type").distinct()
    return (
        grid.crossJoin(F.broadcast(types))
        .join(hourly, ["hour", "event_type"], "left")
        .select(
            F.date_format("hour", TS_FMT).alias("hour"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


def ts2_locf(spark, sf_dir):
    """LOCF (last-observation-carried-forward) interpolation: every event
    carries the user's most recent purchase value — last(ignorenulls) over
    an unbounded-preceding ROWS frame, the standard sparse→dense feature
    fill.  One shuffle on user_id; state per partition is a single value."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    purchase_value = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("ts"),
        F.last(purchase_value, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


def st3_sliding_window(spark, sf_dir):
    """Sliding (hopping) windows — 1 h window every 15 min — in the batch
    binding of streaming.windowed_agg; each event lands in exactly 4
    epoch-aligned windows.  On the stream path the same plan runs
    incrementally with watermark-evicted window state."""
    from maple_spark.streaming.events import windowed_agg

    e = _t(spark, sf_dir, "events")
    out = windowed_agg(e, "1 hour", "15 minutes")
    return out.select(
        F.date_format("window_start", TS_FMT).alias("window_start"),
        F.date_format("window_end", TS_FMT).alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def str2_edit_distance(spark, sf_dir):
    """Levenshtein edit distance as the fuzzy-match primitive (entity
    resolution / near-key joins): nation×region name pairs scored by edit
    distance.  At scale the cross join is bounded by blocking (join on a
    cheap key like first letter or a phonetic code) — demonstrated by the
    ``blk`` flag; the scorer itself is a JVM builtin, no Python."""
    n = _t(spark, sf_dir, "nation").select("n_name")
    r = _t(spark, sf_dir, "region").select("r_name")
    return n.crossJoin(r).select(
        "n_name",
        "r_name",
        F.levenshtein("n_name", "r_name").cast("bigint").alias("edit_dist"),
        (
            F.substring("n_name", 1, 1) == F.substring("r_name", 1, 1)
        ).alias("blk"),
    )


def t7_rolling_fingerprint(spark, sf_dir):
    """Polynomial rolling-hash content fingerprint (Rabin–Karp family,
    base 257 mod 1e9+7) folded over the codepoints — unlike md5 (t4) the
    prefix hashes are reusable for winnowing/chunking.  Engine-portable
    arithmetic (the fold is exact bigint in both engines), so this one is
    oracle-checked; the xxhash shingle variant stays Spark-side
    (textstats.fp_rolling)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_fp"),
        F.expr(
            "aggregate(sequence(1, length(text)), 0L,"
            " (acc, i) -> (acc * 257 + ascii(substring(text, i, 1)))"
            " % 1000000007)"
        ).alias("fp_poly"),
    )


def a14_countmin_sketch(spark, sf_dir):
    """Count-Min sketch point-frequency estimates (the other mergeable
    sketch family: HLL answers distinct-count, CMS answers how-many-of-X
    in depth×width memory).  Built as a pure dataflow
    (functions/sketch.py): one explode+groupBy builds the counter table,
    estimates join it broadcast — no driver round-trip.  Estimates sit
    next to exact counts so the CMS guarantee (estimate ≥ exact,
    ≤ exact + εN) is visible in the output.  Exact vanilla-DuckDB twin
    in ``oracle_sql`` (the buckets are portable md5-fingerprint
    arithmetic, functions/phash.py); the bound and mergeability are
    pytest-asserted."""
    from maple_spark.functions.sketch import countmin_estimate, countmin_table

    o = _t(spark, sf_dir, "orders")
    sketch = countmin_table(o, "o_orderpriority")
    exact = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("exact_n"))
    est = countmin_estimate(sketch, exact.select("o_orderpriority"), "o_orderpriority")
    return exact.join(est, "o_orderpriority").select(
        "o_orderpriority", "exact_n", "cms_estimate"
    )


def a11_hll_sketch(spark, sf_dir):
    """Mergeable HLL sketches (Apache DataSketches binding): per-priority
    distinct-customer estimates plus the re-aggregated global estimate via
    hll_union_agg.  Mergeability is the 100 TB property — partial sketches
    combine across partitions/days without re-scanning, unlike exact
    COUNT(DISTINCT).  Rows-only check (DuckDB's approx engine differs);
    accuracy and union-consistency are pytest-asserted."""
    o = _t(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey", 12).alias("sk")
    )
    return per_group.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").alias("approx_customers"),
    ).unionByName(
        per_group.agg(F.hll_union_agg("sk").alias("sk")).select(
            F.lit("ALL").alias("o_orderpriority"),
            F.hll_sketch_estimate("sk").alias("approx_customers"),
        )
    )


def a15_hll_dataflow(spark, sf_dir):
    """HyperLogLog built as a dataflow (functions/sketch.py:
    hll_registers/hll_estimate) — the distinct-count companion to a14's
    Count-Min: per-priority distinct-customer estimates plus the merged
    global estimate (register-wise max — HLL's lossless union).  Unlike
    a11 (Spark's DataSketches binding, engine-internal bytes, rows-only),
    every register here is plain bitwise codegen over xxhash64, so the
    extended DuckDB oracle reproduces the whole sketch and estimate
    exactly.  One map-only pass + two small groupBys; ≤ 2^p rows per
    group ever shuffle."""
    from maple_spark.functions.sketch import hll_estimate, hll_registers

    o = _t(spark, sf_dir, "orders")
    regs = hll_registers(o, ["o_orderpriority"], "o_custkey", p=12)
    per_group = hll_estimate(regs, ["o_orderpriority"], p=12)
    merged = hll_estimate(
        regs.groupBy("reg").agg(F.max("rho").alias("rho")), [], p=12
    ).select(F.lit("ALL").alias("o_orderpriority"), "approx_n")
    return per_group.unionByName(merged)


def arr1_posexplode(spark, sf_dir):
    """Array flattening (the lateral/UDTF-shaped surface): posexplode the
    embedding vectors into (vec_id, dim, v) rows and aggregate per
    dimension — the layout step behind per-feature normalization stats at
    training-pipeline scale.  The explode is a narrow map-side generator;
    the only shuffle carries (dim, partial aggregates)."""
    em = _t(spark, sf_dir, "embeddings")
    flat = em.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "vec_id", (F.col("pos") + 1).cast("bigint").alias("dim"), F.col("col").alias("v")
    )
    return flat.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        # double→DECIMAL rounding of a float-derived value can differ
        # across engines in the last decimal digit (observed once at
        # sf0.1): round the emitted sum to 6 digits like the libm outputs
        F.round(
            F.sum(F.col("v").cast("decimal(38,9)")).cast("double"), 6
        ).alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


def lat1_lateral_topn(spark, sf_dir):
    """Correlated LATERAL join (SQL dialect surface): top-2 orders per
    customer.  Catalyst decorrelates this into the same window-rank plan a
    hand-written groupwise top-k produces — no per-customer re-execution,
    which is what makes the construct viable on a 100 TB orders table."""
    from maple_spark.catalog import register_views

    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c_acctbal > 9000
        """
    )


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: tight scan-filter-aggregate — the pure pushdown +
    vectorized-scan benchmark (every predicate reaches the Parquet
    reader; no shuffle beyond the final 1-row agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def dt1_date_interval(spark, sf_dir):
    """§1.2 temporal types (DATE/DATETIME/TIMESTAMP + Interval,
    types/Interval.java): casts, interval arithmetic, field extraction,
    date difference — all JVM-side Catalyst datetime expressions."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        # DATE kept as ISO string: Spark collects DateType as datetime.date,
        # DuckDB as Timestamp — same value, different harness repr
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), TS_FMT
        ).alias("due_ts"),
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_98"),
    )


def e12_cast_types(spark, sf_dir):
    """TypeConverter parity (expressions/TypeConverter.java:87-406): value
    casts across the numeric/string ladder.  double→int is intentionally
    absent: Spark truncates, ANSI/DuckDB rounds — a genuine semantic
    difference documented here rather than papered over."""
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size_d"),
        F.col("p_size").cast("string").alias("size_s"),
        F.col("p_size").cast("smallint").alias("size_i16"),
        F.lit("123").cast("int").alias("str_to_int"),
        F.col("p_retailprice").cast("decimal(12,2)").cast("string").alias("price_str"),
        F.col("p_retailprice").cast("string").cast("double").alias("roundtrip_d"),
    )


def tc1_coercion_ladder(spark, sf_dir):
    """§1.2 TypeConverter.coerceArithmetic parity (TypeConverter.java:430-458
    promotion ladder Double > Float > Long > Integer) + E2 unary minus
    (parse-time `0 - e` desugar, nanosql.g:953-957).  Outputs are cast to
    explicit widths (the engines' *native* result widths differ per type
    pair); the values prove the promotion semantics."""
    p = _t(spark, sf_dir, "part").where(F.col("p_partkey") <= 400)
    return p.select(
        "p_partkey",
        (F.col("p_size") + F.lit(1).cast("tinyint"))
        .cast("bigint")
        .alias("int_plus_tiny"),
        (F.col("p_size") + F.col("p_partkey").cast("bigint"))
        .cast("bigint")
        .alias("int_plus_long"),
        (F.col("p_size") * F.col("p_retailprice"))
        .cast("double")
        .alias("int_times_double"),
        (-F.col("p_size")).cast("bigint").alias("neg_size"),
        (F.col("p_size") % F.lit(7)).cast("bigint").alias("mod7"),
    )


def tm1_time_of_day(spark, sf_dir):
    """§1.2 TIME type mapping (reference TIME, types/Time.java h/m/s/ms):
    Spark has no TimeType, so TIME is represented as seconds-of-day BIGINT
    plus the canonical 'HH:mm:ss' string — both extracted JVM-side from
    the event timestamp (session pinned UTC, so both engines agree)."""
    e = _t(spark, sf_dir, "events").where(F.col("event_id") <= 5000)
    sec = F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    return e.select(
        "event_id",
        sec.cast("bigint").alias("sec_of_day"),
        F.date_format("ts", "HH:mm:ss").alias("time_str"),
    )


def t8_tfidf_topterms(spark, sf_dir):
    """TF-IDF top-3 terms per document — corpus-relative term weighting on
    top of t1's per-doc stats.  Smooth idf = ln((1+N)/(1+df)) + 1; score
    rounded to 6 digits BEFORE ranking so both engines rank the same key
    (libm ln differs in the last ulp).  At scale: tf is one shuffle on
    (doc, term) with map-side combine; df and N are tiny aggregates
    broadcast back — the corpus shuffles once."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    # materialize tf once (eager checkpoint): df is derived from it, so
    # the corpus is scanned+exploded a single time instead of once per
    # consumer — tf is (doc, term, count), far smaller than raw text.
    # Eager, not lazy: a lazy localCheckpoint's RDD captures SQL metrics
    # from a throwaway QueryExecution that GC can kill before first run
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(_reliable_or_local_ckpt)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("n_docs"))
                        / (F.lit(1.0) + F.col("df"))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "tf", "score")
    )


def t19_perplexity_score(spark, sf_dir):
    """Unigram-LM cross-entropy scoring — the CCNet/Gopher-class
    perplexity quality filter (Wenzek et al. 2020): fit unigram
    probabilities on the corpus itself, score each document by
    xent = -(1/n) Σ_w k_w·ln(cnt_w/total) = ln(total) - (Σ k·ln cnt)/n
    (nats; perplexity = e^xent).  High xent ⇒ improbable word mix ⇒
    gibberish/outlier candidate.

    Scale shape (t8's): ONE (doc, word) shuffle with map-side combine
    (the localCheckpointed wc table is scanned by all three consumers —
    vocab, total, and the per-doc score — so the corpus explodes once);
    the total is a 1-row broadcast and the vocab join is
    broadcast-hinted only under textstats.vocab_hint's size gate (a
    Heaps-law vocabulary at 100 TB goes un-hinted — AQE decides).
    Cross-engine exactness: the per-doc Σ k·ln(cnt) runs in
    DECIMAL(38,12) (order-independent — the sim4 centroid pattern for
    summing doubles), and the final value rounds to 6 digits, absorbing
    libm ln's last-ulp differences (the t8 rule).  Wordless/NULL docs
    surface NULL scores via the left join (the bpe2 contract)."""
    d = _t(spark, sf_dir, "documents")
    wc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("k"))
        .transform(_reliable_or_local_ckpt)
    )
    vocab = wc.groupBy("w").agg(F.sum("k").alias("cnt"))
    tot = wc.agg(F.sum("k").alias("total"))
    n_vocab = vocab.count()  # drives the broadcast gate; one count job
    scored = (
        wc.join(textstats.vocab_hint(vocab, n_vocab), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_words"),
            F.sum(
                (F.col("k").cast("double") * F.log(F.col("cnt").cast("double")))
                .cast("decimal(38,12)")
            ).alias("_slc"),
            F.max("total").alias("_total"),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.round(
                F.log(F.col("_total").cast("double"))
                - F.col("_slc").cast("double") / F.col("n_words"),
                6,
            ).alias("xent"),
        )
    )
    return d.select("doc_id").join(scored, "doc_id", "left")


def cp5_perplexity_mix(spark, sf_dir):
    """Capstone: perplexity-gated multilingual temperature mix — the
    quality-then-rebalance ENDING of a pretraining pipeline (CCNet's LM
    gate feeding XLM-R's α-sampling): t19 scores every document against
    the corpus-fit unigram LM, documents above the gate (xent > 3.404
    nats — improbable word mixes) drop, and the survivors rebalance
    into a 200-doc budget with per-language quotas ∝ √n_lang and the
    content-stable md5 draw (t18's operator over the GATED set — quota
    weights follow the post-gate language counts, which is the point:
    the gate reshapes the mix before the rebalance sees it).  One
    oracle replays the whole chain (t19's CTEs nested as a CTE + the
    t18 quota/draw SQL).  Scale shape = the pieces': t19's one
    (doc, word) shuffle + broadcasts, then one tiny count, 1-row total,
    broadcast quotas, one rank window per language — the gate adds a
    broadcast hash join on doc_id, no new shuffle class.  Threshold
    3.404 sits mid-distribution at the fixtures (keeps ~75% at sf0.01)
    and is compared on the already-rounded xent BOTH engines agree on
    hash-exactly (t19's gate), so the filter cannot diverge."""
    from maple_spark.pipelines import sampling

    d = _t(spark, sf_dir, "documents")
    scored = t19_perplexity_score(spark, sf_dir)
    # materialize the gated set ONCE (fixed-width (doc_id, lang, xent)
    # rows — the t8 checkpoint pattern): temperature_sample reads its
    # input three times (counts, quota total, final join), and without
    # this the t19 chain's corpus-proportional (doc, word) aggregation
    # would re-execute per consumer (audited: 3 extra 1-row exchanges
    # and 3 re-runs of the per-doc score shuffle)
    kept = (
        d.select("doc_id", "lang")
        .join(
            scored.where(F.col("xent") <= 3.404).select("doc_id", "xent"),
            "doc_id",
        )
        .transform(_reliable_or_local_ckpt)
    )
    out = sampling.temperature_sample(
        kept, "lang", "doc_id", alpha=0.5, budget=200
    )
    return out.select("doc_id", "lang", "xent")


def _lm_context_counts(d, ctx):
    """Shared scaffolding for the stupid-backoff LM tiers (t20 ctx =
    [("prev", 1)], t21 ctx = [("p2", 2), ("p1", 1)], t22 adds p3):
    tokenize + ONE posexplode via textstats.lm_positions (the SAME
    definition the snapshot build/score paths use — they cannot drift
    on the empty-token/NULL rules), aggregate to the
    eagerly-checkpointed fixed-width (doc, *ctx, cur, m, is_train)
    table, and derive the train-half unigram vocab + 1-row total from
    it.  Train membership is a deterministic md5 predicate on doc_id —
    zero join (the t5 split discipline).  ONE definition so the tiers
    cannot drift on the split/checkpoint/vocab rules (review finding,
    round 11)."""
    from maple_spark.pipelines.sampling import md5_draw16

    names = [n for n, _ in ctx]
    e = textstats.lm_positions(d, ctx, "doc_id", "text")
    wcb = (
        e.groupBy("doc_id", *names, "cur")
        .agg(F.count(F.lit(1)).alias("m"))
        .withColumn(
            "is_train",
            md5_draw16(F.concat(F.lit("lm|"), F.col("doc_id").cast("string")))
            % 2
            == 0,
        )
        .transform(_reliable_or_local_ckpt)
    )
    uv = wcb.where("is_train").groupBy("cur").agg(F.sum("m").alias("cnt"))
    tot = uv.agg(F.sum("cnt").alias("total"))
    # gate the unigram-table broadcast hint on the ACTUAL vocab size
    # (one count job over the checkpointed wcb — these builders are
    # eager_by_design): at gate scale the hint keeps the known-good
    # broadcast plan; a Heaps-law vocabulary at 100 TB must not be
    # forced into the 8 GB broadcast wall, so above
    # textstats.VOCAB_BROADCAST_MAX_ROWS the joins go un-hinted and AQE
    # decides from measured sizes (VERDICT r11 watch item #2).
    n_vocab = uv.count()
    return wcb, uv, tot, n_vocab


def _lm_score_from(d, joined, term):
    """Shared per-doc scoring aggregate for the backoff tiers —
    delegates to textstats.lm_score_agg (ONE definition with the
    snapshot scorer): n_words, OOV token count, DECIMAL(38,12)
    order-independent Σ m·term, final round(6), NULL-surfacing
    wordless/NULL docs via the left join."""
    return textstats.lm_score_agg(d, joined, term, "doc_id")



def _lm_inline_tier(spark, sf_dir, order):
    """Shared construction for the inline backoff tiers t20-t23 — the
    tiers differ ONLY by LM_CTX order: derive each n-gram model from
    the checkpointed train half of wcb, then build the join pyramid +
    backoff term through textstats.lm_backoff_join (the ONE definition
    also used by the snapshot scorer, so the tiers and lm_score cannot
    drift — round-12 review; three hand-kept copies preceded this)."""
    d = _t(spark, sf_dir, "documents")
    ctx = textstats.LM_CTX[order]
    names = [n for n, _ in ctx]
    wcb, uv, tot, n_vocab = _lm_context_counts(d, ctx)
    train = wcb.where("is_train")
    models = {}
    for n in range(2, order + 1):
        keys = names[-(n - 1):]
        models[n] = (
            train.where(F.col(keys[0]).isNotNull())
            .groupBy(*keys, "cur")
            .agg(F.sum("m").alias(textstats.LM_CNT_COLS[n]))
        )
    joined, term = textstats.lm_backoff_join(
        wcb,
        uv.select(F.col("cur").alias("w"), "cnt"),
        tot,
        n_vocab,
        order,
        models,
    )
    return _lm_score_from(d, joined, term)


def t20_bigram_perplexity(spark, sf_dir):
    """Bigram stupid-backoff LM scoring (round 11) — one n-gram order up
    from t19 toward the production CCNet gate (Wenzek et al. 2020 use a
    5-gram KenLM; Brants et al. 2007 define stupid backoff):
    S(w|p) = bcnt(p,w)/cnt(p) when the bigram was seen in training, else
    0.4 · cnt(w)/total; the first token scores unigram, OOV tokens score
    cnt:=1.  xent = -(1/n) Σ ln S in nats; perplexity = e^xent.

    Unlike t19 (fit on the scoring corpus itself, so every bigram is
    "seen"), the LM here fits on the CONTENT-STABLE TRAIN HALF
    (md5_draw16('lm|'||doc_id) % 2 = 0 — the t5 split discipline) and
    scores ALL documents, so the backoff and OOV branches genuinely
    fire on the held-out half — the shape a deployment has when the LM
    is fit on a reference corpus (CCNet fits on Wikipedia).

    Scale shape: the corpus explodes ONCE into (doc, prev, cur)
    position pairs (prev from the SAME array via element_at — no
    self-join, no per-doc window sort), aggregates to the checkpointed
    fixed-width wcb table, and everything derives from wcb: unigram
    vocab + 1-row total (vocabulary-sized, broadcast — t19's rule),
    the bigram model (its OWN groupBy — bigram vocab is the one table
    here that may NOT broadcast at 100 TB, so its join is left
    un-hinted for AQE to pick shuffle-vs-broadcast by measured size),
    and the per-doc score (map-side partial sums into one doc_id
    exchange).  Train membership is a deterministic md5 predicate on
    wcb.doc_id — zero join.  Cross-engine exactness: per-row ln terms
    as DIFFERENCES of ln(integer counts), each m·term cast to
    DECIMAL(38,12) before the order-independent sum, final round(6)
    absorbing libm's last ulp (the t19 discipline).  Wordless/NULL
    docs surface NULL via the left join (the bpe2 contract)."""
    return _lm_inline_tier(spark, sf_dir, 2)


def t21_trigram_perplexity(spark, sf_dir):
    """Trigram stupid-backoff LM (round 11) — the next order up from
    t20 toward the 5-gram KenLM production gate:
    S(w|p2,p1) = tcnt/bcnt(p2,p1) when the trigram was seen in
    training, else 0.4·S(w|p1) (t20's bigram chain, itself backing off
    0.4·cnt'(w)/total on unseen bigrams, OOV cnt':=1); positions 1/2
    score with the unigram/bigram chains directly.  Same md5-train
    split as t20 — and at this order backoff is no longer rare: 26% of
    the sf0.01 gate's token positions miss the trigram table (vs 9
    token GROUPS missing bigrams in t20), so the recursive-backoff
    arithmetic itself is hash-checked at volume.

    Scale shape = t20's with one more derived model: ONE corpus
    explode (p2/p1 via element_at on the row's own array), a
    checkpointed (doc, p2, p1, cur, m) table, unigram vocab + 1-row
    total broadcast, bigram + trigram models via their own groupBys
    with UN-HINTED joins (three context joins: (p1,cur) probability,
    (p2,p1) context denominator, (p2,p1,cur) trigram — none is
    broadcastable by contract at 100 TB, AQE decides from measured
    size).  DECIMAL(38,12) per-term sums + round(6); NULL/wordless
    docs surface NULL (the bpe2 contract)."""
    return _lm_inline_tier(spark, sf_dir, 3)


def t22_fourgram_perplexity(spark, sf_dir):
    """4-gram stupid-backoff LM (round 12) — one order short of the
    production 5-gram KenLM gate (Wenzek et al. 2020), mechanically on
    t21's scaffolding: S(w|p3,p2,p1) = qcnt/tcnt(p3,p2,p1) when the
    4-gram was seen in training, else 0.4·S(w|p2,p1) (t21's trigram
    chain, recursing through t20's bigram chain down to the unigram
    0.4·cnt'(w)/total, OOV cnt':=1); positions 1/2/3 score with the
    unigram/bigram/trigram chains directly.  Same md5 train split — at
    this order the 4-gram table misses on MOST held-out positions, so
    the full three-deep backoff recursion is hash-checked at volume.

    Scale shape = t21's with one more derived model: ONE corpus explode
    (p3/p2/p1 via element_at on the row's own array), a checkpointed
    (doc, p3, p2, p1, cur, m) table, unigram vocab joins under the
    vocab_hint size gate, bigram/trigram/fourgram models via their own
    groupBys with UN-HINTED joins (five context joins — none is
    broadcastable by contract at 100 TB, AQE decides from measured
    size).  DECIMAL(38,12) per-term sums + round(6); NULL/wordless docs
    surface NULL (the bpe2 contract)."""
    return _lm_inline_tier(spark, sf_dir, 4)


def t23_fivegram_perplexity(spark, sf_dir):
    """5-gram stupid-backoff LM (round 12) — THE production order: the
    CCNet quality gate scores web text with a 5-gram KenLM fit on
    Wikipedia (Wenzek et al. 2020; Brants et al. 2007 define stupid
    backoff), and this tier completes the chain t19→t20→t21→t22 built
    order by order: S(w|p4..p1) = pcnt/qcnt(p4..p1) when the 5-gram was
    seen in training, else 0.4·S(w|p3..p1) (t22's 4-gram chain,
    recursing down to the unigram 0.4·cnt'(w)/total, OOV cnt':=1);
    positions 1-4 score with the unigram/bigram/trigram/4-gram chains
    directly.  Same md5 train split — at order 5 the model table misses
    on nearly every held-out position, so the four-deep backoff
    recursion is hash-checked at volume.

    Scale shape = t22's with one more derived model: ONE corpus explode
    (p4..p1 via element_at on the row's own array — no self-join), a
    checkpointed (doc, p4, p3, p2, p1, cur, m) table, unigram vocab
    joins under the vocab_hint size gate, bigram/trigram/4-gram/5-gram
    models via their own groupBys with UN-HINTED joins (seven context
    joins — none is broadcastable by contract at 100 TB, AQE decides
    from measured size; at this order the model tables approach
    token-count cardinality, which is exactly why build_lm_snapshot's
    KenLM-style min_count pruning exists for the persisted form).
    DECIMAL(38,12) per-term sums + round(6); NULL/wordless docs surface
    NULL (the bpe2 contract)."""
    return _lm_inline_tier(spark, sf_dir, 5)


def t25_lm_snapshot_merge(spark, sf_dir):
    """Mergeable LM snapshots (round 12): fit the reference's two
    shards INDEPENDENTLY (doc_id%4 ∈ {0,2} — shard-parallel, or
    equivalently an incremental refresh that only ever fits the new
    shard), merge by per-key count sums
    (textstats.merge_lm_snapshots), score the held-out half against
    the merged model.  n-gram counts are mergeable partials, so this
    is VALUE-IDENTICAL to a monolithic fit on the whole reference —
    the oracle is exactly that monolithic formulation, making the
    merge's exactness driver-checked (pytest additionally pins
    table-for-table equality and the mixed-order / pruned-input
    refusals).  At 100 TB: old shards are never re-scanned; a
    snapshot refresh costs one shard fit + model-table-sized sums."""
    d = _t(spark, sf_dir, "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    held = d.where(F.col("doc_id") % 2 == 1)
    root = _snapshot_root(sf_dir, "lm_merge")
    textstats.build_lm_snapshot(
        ref.where(F.col("doc_id") % 4 == 0), f"{root}/a", order=2
    )
    textstats.build_lm_snapshot(
        ref.where(F.col("doc_id") % 4 == 2), f"{root}/b", order=2
    )
    textstats.merge_lm_snapshots(
        spark, [f"{root}/a", f"{root}/b"], f"{root}/m"
    )
    return textstats.lm_score(held, f"{root}/m")


def t26_dsir_select(spark, sf_dir):
    """DSIR data selection (Xie et al., NeurIPS 2023 — "Data Selection
    for Language Models via Importance Resampling"): pick the 100
    raw-pool documents that look most like the target corpus.  Target =
    the ``lang = 'en'`` docs (the "clean reference" role Wikipedia
    plays in the paper), pool = every other document; features are
    HASHED unigram+bigram counts in 512 md5 buckets; each pool doc
    weighs log w = Σ_b c_b·(ln p_b − ln q_b) under add-one-smoothed
    bucket distributions, and selection is Gumbel-top-k (∝ w, without
    replacement) with the content-stable md5 draw as the noise source.
    The reference engine has no counterpart (north-star work); this is
    the selection operator that feeds the same pipelines as the
    perplexity gates t19..t23.

    Scale shape (see sampling.dsir_importance): ONE corpus
    tokenize/explode via the LM tiers' shared lm_positions, counts
    checkpointed once and reused by both distribution fits and the
    scoring join; the λ model is ≤ 512 rows BY CONSTRUCTION (hashing
    bounds the feature space — the DSIR design point), so its
    force-broadcast can never hit the 8 GB wall, unlike a Heaps-law
    vocabulary; top-k plans as TakeOrderedAndProject.  Cross-engine
    exactness: DECIMAL(38,12) c·λ partial sums, Gumbel key summed in
    DECIMAL too, output rounded to 6 digits (the t19/t8 rule)."""
    from maple_spark.pipelines import sampling

    d = _t(spark, sf_dir, "documents")
    s = sampling.dsir_importance(
        d, F.col("lang") == F.lit("en"), n_buckets=512, k=100
    )
    return s.select(
        "doc_id",
        "n_grams",
        F.round(F.col("slc").cast("double"), 6).alias("logw"),
        F.round(F.col("key").cast("double"), 6).alias("dsir_key"),
    )


def t19s_lm_snapshot_score(spark, sf_dir):
    """The PRODUCTION shape of the perplexity gate — the quality twin
    of d6s: textstats.build_lm_snapshot persists the unigram LM fit on
    the content-stable md5 train half ONCE (vocab + total parquet, the
    CCNet fit-on-reference/score-the-crawl split), and lm_score reads
    THAT snapshot to score every document (OOV words back off to
    cnt:=1, n_oov reported).  Scoring is batch-local, so the streaming
    ingest gate is a ZERO-state foreachBatch (equality-tested in
    test_streaming); this entry driver-checks the snapshot-read plan a
    deployment actually runs."""
    from maple_spark.pipelines.sampling import md5_draw16

    d = _t(spark, sf_dir, "documents")
    train = d.where(
        md5_draw16(F.concat(F.lit("lm|"), F.col("doc_id").cast("string"))) % 2
        == 0
    )
    snap = _snapshot_root(sf_dir, "lm")
    textstats.build_lm_snapshot(train, snap)
    return textstats.lm_score(d, snap)


def t20s_lm_snapshot_backoff(spark, sf_dir):
    """The backoff LM in its PRODUCTION snapshot form (round 12 — the
    r11 verdict's task 4): build_lm_snapshot(order=2) persists the
    bigram stupid-backoff model fit on the md5 train half ONCE (vocab +
    bigram + meta parquet; meta records order and n_vocab), and
    lm_score reads THAT snapshot to score every document — the CCNet
    fit-on-reference/score-the-crawl regime at the n-gram order t19s's
    unigram snapshot could not express.  Output ≡ t20_bigram_perplexity
    (the model tables round-trip losslessly and the scoring term is the
    same chain — equality-tested in pytest); oracle shared verbatim
    with t20.  The scoring plan is the snapshot-READ one: one corpus
    posexplode, vocab joins under textstats.vocab_hint's recorded-size
    broadcast gate, the bigram model join NEVER hinted, the total READ
    from meta (no refit, no SinglePartition) — plan-pinned in
    tests/test_plan_shape.py."""
    from maple_spark.pipelines.sampling import md5_draw16

    d = _t(spark, sf_dir, "documents")
    train = d.where(
        md5_draw16(F.concat(F.lit("lm|"), F.col("doc_id").cast("string"))) % 2
        == 0
    )
    snap = _snapshot_root(sf_dir, "lm2")
    textstats.build_lm_snapshot(train, snap, order=2)
    return textstats.lm_score(d, snap)


def a12_stats_moments(spark, sf_dir):
    """Statistical aggregates (stddev, correlation) computed from exact
    decimal moments — the mergeable-moments formulation: partial sums of
    (x, x², y, y², xy) combine associatively across partitions, so the
    result is order-independent where a naive running variance is not.
    One double rounding at the end; round(6) absorbs the last ulp."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sx"),
        F.sum(q * q).alias("sxx"),
        F.sum(p).alias("sy"),
        F.sum(p * p).alias("syy"),
        F.sum(q * p).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return m.select(
        "l_returnflag",
        "n",
        F.round(sx / nd, 6).alias("mean_qty"),
        F.round(
            F.sqrt((sxx - sx * sx / nd) / (nd - F.lit(1.0))), 6
        ).alias("std_qty"),
        F.round(
            (nd * sxy - sx * sy)
            / (
                F.sqrt(nd * sxx - sx * sx)
                * F.sqrt(nd * syy - sy * sy)
            ),
            6,
        ).alias("corr_qty_price"),
    )


def a13_histogram(spark, sf_dir):
    """Fixed-width numeric histogram (the ANALYZE/stats companion: the
    reference keeps only min/max/numUnique per column,
    qeval/ColumnStats.java:16-35 — a binned distribution is the scale-up).
    Plain floor arithmetic on both engines (width_bucket variants differ
    at edges); one partial+final count per bin, 12-row output."""
    o = _t(spark, sf_dir, "orders")
    bin_ = F.least(
        F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("bigint"),
        F.lit(11).cast("bigint"),
    )
    return (
        o.groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bin",
            (F.col("bin") * 50000).cast("bigint").alias("lo"),
            "n_orders",
        )
    )


#: BM25 query terms — fixed literals so both engines score the same set
BM25_TERMS = ("scan", "join", "filter")
BM25_K1, BM25_B = 1.2, 0.75


def t9_bm25_search(spark, sf_dir):
    """BM25 ranked retrieval for a fixed term set — the search-side twin
    of t8's TF-IDF: Okapi idf = ln(1 + (N-df+0.5)/(df+0.5)), tf saturation
    k1=1.2, length normalization b=0.75 against the mean doc length.
    Scores round to 6 digits BEFORE ranking (libm ln).  At scale the only
    corpus-wide work is one scan + one (doc, term) shuffle into a
    checkpointed count table; df/avgdl/N are tiny broadcast aggregates,
    and top-10 plans as TakeOrderedAndProject (per-partition partial
    top-k), never a global sort."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).where(F.col("term") != "")
    # one corpus scan: materialize per-(doc, term) counts, then derive
    # doc length (sum over terms), query-term tf (filter), df, and avgdl
    # all from the checkpointed counts — naive lineage would re-explode
    # the corpus once per consumer (4 scans)
    tf_all = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tfc"))
        .transform(_reliable_or_local_ckpt)  # eager: see t7 note on lazy-checkpoint GC hazard
    )
    dl = tf_all.groupBy("doc_id").agg(F.sum("tfc").alias("dl"))
    tf = tf_all.where(F.col("term").isin(*BM25_TERMS)).select(
        "doc_id", "term", F.col("tfc").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    glob = d.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
        )
    )
    nd, dfc = F.col("n_docs").cast("double"), F.col("df").cast("double")
    idf = F.log(
        F.lit(1.0) + (nd - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
    )
    tfd, dld = F.col("tf").cast("double"), F.col("dl").cast("double")
    denom = tfd + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dld / F.col("avgdl")
    )
    # per-term contribution rounded then summed as exact decimal: FP
    # addition isn't associative, so a double sum could differ between
    # engines when term rows arrive in different orders
    contrib = F.round(idf * tfd * F.lit(BM25_K1 + 1.0) / denom, 6).cast(
        "decimal(18,6)"
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(glob))
        .groupBy("doc_id")
        .agg(F.sum(contrib).cast("double").alias("score"))
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 10)
        .select("rnk", "doc_id", "score")
    )


#: sequence packing parameters: tokens per training window, shard sizing
PACK_CAPACITY = 2048
PACK_SHARDS_FLOOR = 16
#: one packing shard (= one writer task / pack file stream) per this much
#: source parquet — matches typical file-split sizing so shard count grows
#: linearly with input instead of being a fixed foot-gun
PACK_SHARD_INPUT_BYTES = 64 * 1024 * 1024


def pack_shards_for_bytes(input_bytes: int) -> int:
    """Shard count for sequence packing at a given input size: one shard
    per 64 MiB of source parquet, floor 16.  Pure so it's unit-testable at
    sizes the fixtures can't reach; at the committed fixtures (sf0.01 =
    66 KB, sf0.1 = 595 KB of documents.parquet) this is exactly the floor,
    so the packing output — shard is part of it — is unchanged and the
    DuckDB oracles' literal ``doc_id % 16`` stays valid.  BOTH t10 and
    cp3 (whose packing stage shares this sizing) carry that literal:
    past ~64 MiB of documents.parquet the shard count grows and those
    two oracles stop being comparable by design — the fixture-floor
    equivalence is pinned in tests/test_contract.py."""
    import math as _math

    return max(PACK_SHARDS_FLOOR, _math.ceil(input_bytes / PACK_SHARD_INPUT_BYTES))


def _pack_shards(d) -> int:
    """Derive the shard count from the relation's parquet footprint —
    metadata only (shared ``util.parquet_files_stats``), no data scan.
    Unstatable sources fall back to the floor."""
    from maple_spark.pipelines.util import parquet_files_stats

    stats = parquet_files_stats(d)
    if stats is None:
        return PACK_SHARDS_FLOOR
    return pack_shards_for_bytes(stats[0])


def t16_ngram_counts(spark, sf_dir):
    """Corpus n-gram vocabulary with threshold pruning — the LM corpus
    statistics job: count every word trigram and keep those occurring
    ≥ 5 times.  Map-side: per-row word split + a 1-based sliding window
    (element_at matches DuckDB's 1-based list indexing exactly); then
    ONE shuffle of (ngram, partial count) with map-side combine, and
    the HAVING threshold prunes the long tail before anything else
    consumes the table — at 100 TB the pruned vocabulary is orders of
    magnitude smaller than the raw gram stream, and partial aggregation
    means the shuffle carries per-partition counts, not occurrences.
    Gram construction is curation's shared ``word_ngrams_best`` builder
    (the same windowing t11's decontamination uses — Arrow kernel tier,
    expression fallback), with empty tokens filtered."""
    from maple_spark.pipelines.curation import word_ngrams_best

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            F.explode(
                word_ngrams_best("text", 3, filter_empty=True, df=d)
            ).alias("ngram")
        )
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 5)
    )


def t17_dup_spans(spark, sf_dir):
    """Exact duplicated-span report (curation.duplicated_spans): per doc,
    how many of its 15-word-gram positions carry a span that also appears
    in another document — the exact-substring-dedup signal (Lee et al.
    2022) that document-level dedup misses.  The gram stream shuffles as
    the portable md5 fingerprint (functions/phash.py), so the oracle
    replays the pipeline in vanilla DuckDB SQL, value-exact."""
    from maple_spark.pipelines.curation import duplicated_spans

    d = _t(spark, sf_dir, "documents")
    return duplicated_spans(d, "doc_id", "text", n=15)


def t10_sequence_pack(spark, sf_dir):
    """Sequence packing for pretraining batches — the GPT-style pipeline
    step: concatenate documents in a deterministic order and cut the
    token stream into fixed-capacity windows.  Each doc gets the pack id
    and token offset where it starts.  Sharding by doc_id % K makes the
    running sum a per-shard window (one shuffle, K independent streams) —
    the 100 TB shape, where a single global cumulative sum would
    serialize; shards map 1:1 to writer tasks emitting pack files.
    K itself scales with input size (one shard per 64 MiB of source,
    floor 16 — see :func:`pack_shards_for_bytes`), so at 100 TB the
    cumulative sum runs on ~1.6 M independent streams, not 16."""
    d = _t(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    ).cast("bigint")
    shard = (F.col("doc_id") % _pack_shards(d)).cast("bigint")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    toks = d.select("doc_id", shard.alias("shard"), n_tokens.alias("n_tokens"))
    return toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok"),
    ).select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.col("start_tok") / PACK_CAPACITY).cast("bigint").alias("pack_id"),
        (F.col("start_tok") % PACK_CAPACITY).cast("bigint").alias("pack_offset"),
    )


def arr2_array_ops(spark, sf_dir):
    """Array-function surface over the embedding column (beyond arr1's
    posexplode): size, higher-order aggregate/transform/filter folds,
    slice, min/max.  Float elements are widened to double BEFORE the fold
    (DuckDB list functions on FLOAT[] accumulate in float32 — the rule
    from the cosine queries); both engines fold left in array order, and
    round(6) absorbs the last ulp.  All JVM-side Catalyst expressions —
    no Python."""
    e = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 2000)
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("n_dims"),
        F.round(
            F.aggregate(
                as_double, F.lit(0.0), lambda acc, x: acc + F.abs(x)
            ),
            6,
        ).alias("l1_norm"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vmin"),
        F.round(
            F.aggregate(
                F.slice(as_double, 1, 4), F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("head4_sum"),
        F.size(F.filter("embedding", lambda x: x > F.lit(0.0)))
        .cast("bigint")
        .alias("n_pos"),
    )


def dml_update_where(spark, sf_dir):
    """UPDATE ... SET ... WHERE as its pure read-transform (the rewrite
    half of commands/UpdateCommand.java; persistence tested in pytest).
    SQL-expressible as CASE WHEN, so oracle-gated."""
    from maple_spark.operators.dml import update_where

    o = _t(spark, sf_dir, "orders")
    updated = update_where(
        o,
        F.col("o_orderpriority") == "1-URGENT",
        # exact decimal product then round: double `x*1.1` lands on
        # half-cent ties that engines round differently
        {
            "o_totalprice": F.round(
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.lit("1.1").cast("decimal(2,1)"),
                2,
            ).cast("double")
        },
    )
    return updated.select("o_orderkey", "o_totalprice", "o_orderpriority")


def dml_delete_where(spark, sf_dir):
    """DELETE ... WHERE as its pure read-transform (keep complement,
    NULL-safe: rows where the predicate is NULL are kept, matching
    SQL DELETE semantics)."""
    from maple_spark.operators.dml import delete_where

    o = _t(spark, sf_dir, "orders").withColumn(
        "maybe_price", F.nullif(F.col("o_totalprice"), F.lit(0.0))
    )
    kept = delete_where(o, F.col("maybe_price") > 300000)
    return kept.select("o_orderkey", "o_totalprice")


# ----------------------------------------------------------------------
# registry
# ----------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # The driver's correctness gate value-checks the FIRST 50 entries in
    # dict order.  The window is composed to cover every SURVEY §2 family
    # with its riskiest representative, and ROTATES each round so
    # never-driver-checked entries earn external verification: round 6
    # rotated in the hash-defined + LLM-pipeline risk surface (d6/st7/
    # t16/a14/a15/st6/t15/sim3/t17); round 8 rotated in aj1/rj2/w2/q7/
    # q9/q18/t8/sim2/sim5/dml_update; round 9 rotated in the ten
    # most-expensive never-checked plans (cp1/sim4/sim1/mm1/mm2/hh1/
    # lat1/q8/q21/pv1); round 10 rotated in cp2/cp3/cp4/sim6/t18 plus
    # the curation + streaming families' never-checked members
    # (t11/t12/t13/st1/st2); round 11 rotates in the six round-10
    # additions that shipped driver-unverified (t19/cp5/bpe3/sim4s/
    # sim6s/d6s — the r10 verdict's top task), the NEW t20
    # bigram-backoff LM (in-window from birth, so it does not repeat
    # that ship-unverified pattern), and a first slice of the
    # never-checked TPC-H tail (q6/q10/q12/q14/q19); round 12 rotates
    # in the REST of the never-checked TPC-H tail (q2/q4/q11/q13/q15/
    # q16/q17/q20/q22 — the reference's own test corpus is
    # SELECT-shaped, so these are the likeliest real-user shapes), the
    # never-checked streaming (st3/st4/st5) and time-series
    # (ts1/ts2/ts3) families, rj1 + dml_delete (their families' last
    # never-checked members), and the SIX NEW round-12 operators
    # in-window from birth (t20s snapshot-backoff LM, t22 4-gram LM,
    # and the mid-round t23 5-gram LM / t24 gopher gate / cp6
    # incremental-ingest capstone / t25 merged-LM-snapshot probe /
    # late-round t26 DSIR selection + d8 bloom guard —
    # cp4/sim5/cp2/d7/t5/d1, all driver-checked in a prior round,
    # moved out to seat them; their families keep checked reps),
    # rotating OUT nineteen r11-checked members whose family keeps an
    # externally-checked representative (q6/q10/q12/q14/q19/q21 → q3
    # stays + 9 new q's in; t19/t20/cp5/bpe3 → t21 stays checked +
    # t20s/t22 from birth, bpe1/2/3 all checked r10/r11; sim4s/sim6s →
    # sim2/sim3 stay; d4 → d1/d3/d6s stay; rj2 → rj1 in + aj1
    # checked r9; a6 → a2 stays; a14 → a15 stays; j4_left → j2 stays;
    # t15 → t5 stays; dml_update → dml_delete in — all stay
    # selfchecked).  d6s/st7 stay in-window because their banding core
    # changes this round.  Rotated-out entries live right after the
    # window; composition is pinned by
    # tests/test_contract.py::test_driver_window_composition.
    return {
        "flagship_join_topk": flagship_join_topk,
        "s1_scan_filter": s1_scan_filter,
        "p1_project_expr": p1_project_expr,
        "e13_scalar_funcs": e13_scalar_funcs,
        "j2_join_inner": j2_join_inner,
        "j7_anti_not_exists": j7_anti_not_exists,
        "a2_groupby_q1": a2_groupby_q1,
        "a15_hll_dataflow": a15_hll_dataflow,
        "o1_sort_rownum": o1_sort_rownum,
        "set_union": set_union,
        "w1_window_rank": w1_window_rank,
        "t25_lm_snapshot_merge": t25_lm_snapshot_merge,
        "q3_shipping_priority": q3_shipping_priority,
        "st8_stream_dedup": st8_stream_dedup,
        "t1_text_stats": t1_text_stats,
        "t17_dup_spans": t17_dup_spans,
        "d8_bloom_guard": d8_bloom_guard,
        "d3_minhash_lsh": d3_minhash_lsh,
        "t26_dsir_select": t26_dsir_select,
        "sim2_embedding_near_dup": sim2_embedding_near_dup,
        "sim3_lsh_topk": sim3_lsh_topk,
        "t24_gopher_rules": t24_gopher_rules,
        "mm1_media_features": mm1_media_features,
        "st7_cross_dedup_stream": st7_cross_dedup_stream,
        "cp1_corpus_pipeline": cp1_corpus_pipeline,
        "cp6_incremental_ingest": cp6_incremental_ingest,
        "cp3_pretraining_ingest": cp3_pretraining_ingest,
        "t23_fivegram_perplexity": t23_fivegram_perplexity,
        "t21_trigram_perplexity": t21_trigram_perplexity,
        "d6s_snapshot_guard": d6s_snapshot_guard,
        "t19s_lm_snapshot_score": t19s_lm_snapshot_score,
        # round 12 rotation: the NEW operators (in-window from birth;
        # the third, t23, sits in cp4's old slot above) + the
        # never-checked TPC-H tail + the streaming and time-series
        # families + rj1/dml_delete
        "t20s_lm_snapshot_backoff": t20s_lm_snapshot_backoff,
        "t22_fourgram_perplexity": t22_fourgram_perplexity,
        "q2_groupwise_max": q2_groupwise_max,
        "q4_order_priority": q4_order_priority,
        "q11_important_stock": q11_important_stock,
        "q13_customer_distribution": q13_customer_distribution,
        "q15_top_supplier": q15_top_supplier,
        "q16_supplier_cnt": q16_supplier_cnt,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q20_excess_shipments": q20_excess_shipments,
        "q22_global_sales_opportunity": q22_global_sales_opportunity,
        "st3_sliding_window": st3_sliding_window,
        "st4_quota_admit": st4_quota_admit,
        "st5_stream_join": st5_stream_join,
        "ts1_gapfill": ts1_gapfill,
        "ts2_locf": ts2_locf,
        "ts3_hierarchical_rollup": ts3_hierarchical_rollup,
        "rj1_range_join": rj1_range_join,
        "dml_delete_where": dml_delete_where,
        # --- end of the driver-checked first-50 window ---
        # rotated out of the window in round 12 (all externally checked
        # in a prior round, still selfchecked).  cp4 and sim5 moved out
        # mid-round to seat the NEW t23 / t24 in-window from birth
        # (capstone family keeps cp1/cp3 + the new cp6 in-window,
        # similarity keeps sim2/sim3, dedup keeps d1/d3/d6s/st7/st8;
        # all were driver-checked r11 — cp2 moved out likewise to seat
        # cp6, d7 to seat t25):
        "cp4_dedup_token_budget": cp4_dedup_token_budget,
        "t5_hash_split": t5_hash_split,
        "d1_dedup_exact": d1_dedup_exact,
        "sim5_semdedup": sim5_semdedup,
        "cp2_curation_pipeline": cp2_curation_pipeline,
        "d7_canonical_docs": d7_canonical_docs,
        "j4_join_left": j4_join_left,
        "rj2_interval_overlap": rj2_interval_overlap,
        "a6_minmax_sumavg": a6_minmax_sumavg,
        "a14_countmin_sketch": a14_countmin_sketch,
        "q21_waiting_supplier": q21_waiting_supplier,
        "t15_weighted_sample": t15_weighted_sample,
        "d4_simhash_pairs": d4_simhash_pairs,
        "dml_update_where": dml_update_where,
        "t19_perplexity_score": t19_perplexity_score,
        "cp5_perplexity_mix": cp5_perplexity_mix,
        "t20_bigram_perplexity": t20_bigram_perplexity,
        "bpe3_bpe_merges_hybrid": bpe3_bpe_merges_hybrid,
        "sim4s_ivf_snapshot_topk": sim4s_ivf_snapshot_topk,
        "sim6s_quantized_snapshot_topk": sim6s_quantized_snapshot_topk,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q10_returned_items": q10_returned_items,
        "q12_shipmode_priority": q12_shipmode_priority,
        "q14_promo_effect": q14_promo_effect,
        "q19_disjunctive_pushdown": q19_disjunctive_pushdown,
        # rotated out of the window in round 11 (all externally checked
        # in round 10, still selfchecked):
        "st6_hll_stream": st6_hll_stream,
        "t16_ngram_counts": t16_ngram_counts,
        "bpe1_bpe_merges": bpe1_bpe_merges,
        "bpe2_bpe_token_counts": bpe2_bpe_token_counts,
        "d5_dedup_clusters": d5_dedup_clusters,
        "d6_cross_dedup": d6_cross_dedup,
        "sim4_ivf_topk": sim4_ivf_topk,
        "sim6_quantized_topk": sim6_quantized_topk,
        "t18_temperature_sample": t18_temperature_sample,
        "t11_decontaminate": t11_decontaminate,
        "t12_repetition_stats": t12_repetition_stats,
        "t13_pii_scrub": t13_pii_scrub,
        "st1_hourly_agg": st1_hourly_agg,
        "st2_sessionize": st2_sessionize,
        # rotated out of the window in round 10 (all externally checked
        # in round 9, still selfchecked):
        "e3_null_compare": e3_null_compare,
        "e10_scalar_subquery": e10_scalar_subquery,
        "aj1_asof_join": aj1_asof_join,
        "hh1_heavy_hitters": hh1_heavy_hitters,
        "lat1_lateral_topn": lat1_lateral_topn,
        "pv1_pivot": pv1_pivot,
        "q8_market_share": q8_market_share,
        "d2_ngram_jaccard": d2_ngram_jaccard,
        "sim1_cosine_topk": sim1_cosine_topk,
        "mm2_frame_stats": mm2_frame_stats,
        # rotated out of the window in round 9 (still selfchecked):
        "e6_like": e6_like,
        "str1_string_funcs": str1_string_funcs,
        "j3_sort_merge_join": j3_sort_merge_join,
        "j5_using_join": j5_using_join,
        "j7_semi_in_subquery": j7_semi_in_subquery,
        "a4_count_distinct": a4_count_distinct,
        "a9_rollup": a9_rollup,
        "t3_quality_score": t3_quality_score,
        "t6_quota_sample": t6_quota_sample,
        "q7_volume_shipping": q7_volume_shipping,
        # rotated out of the window in round 8 (still selfchecked):
        "p4_rename": p4_rename,
        "e1_arithmetic": e1_arithmetic,
        "e8_in_list": e8_in_list,
        "j6_cross_join": j6_cross_join,
        "a7_having": a7_having,
        "a8_distinct": a8_distinct,
        "o3_topk": o3_topk,
        "set_intersect": set_intersect,
        "q5_local_supplier": q5_local_supplier,
        "t2_language_id": t2_language_id,
        # rotated out of the window in round 6 (still selfchecked):
        "t4_fingerprint": t4_fingerprint,
        "e5_between": e5_between,
        "e7_similar_to": e7_similar_to,
        "e11_is_null": e11_is_null,
        "e13_trig_funcs": e13_trig_funcs,
        "j4_join_right": j4_join_right,
        "j4_join_full": j4_join_full,
        "j5_natural_join": j5_natural_join,
        "set_except": set_except,
        "mm3_embed_stub": mm3_embed_stub,
        "enc1_encoding_report": enc1_encoding_report,
        "fn1_funnel": fn1_funnel,
        "s2_column_pruned_scan": s2_column_pruned_scan,
        "e4_boolean_ops": e4_boolean_ops,
        "sql_dialect": sql_dialect,
        "udf_normalize": udf_normalize,
        "json_props": json_props,
        "ck1_constraints": ck1_constraints,
        "dt1_date_interval": dt1_date_interval,
        "e12_cast_types": e12_cast_types,
        "tc1_coercion_ladder": tc1_coercion_ladder,
        "tm1_time_of_day": tm1_time_of_day,
        "w3_range_frame": w3_range_frame,
        "w4_rank_distribution": w4_rank_distribution,
        "a12_stats_moments": a12_stats_moments,
        "a13_histogram": a13_histogram,
        "t9_bm25_search": t9_bm25_search,
        "t10_sequence_pack": t10_sequence_pack,
        "arr2_array_ops": arr2_array_ops,
        "a9_cube": a9_cube,
        "a10_percentiles": a10_percentiles,
        "a9_grouping_sets": a9_grouping_sets,
        "arr1_posexplode": arr1_posexplode,
        "a11_hll_sketch": a11_hll_sketch,
        "t7_rolling_fingerprint": t7_rolling_fingerprint,
        "str2_edit_distance": str2_edit_distance,
        "vnt1_variant_extract": vnt1_variant_extract,
        "e14_try_functions": e14_try_functions,
        "set_intersect_all": set_intersect_all,
        "set_except_all": set_except_all,
        "pv2_unpivot": pv2_unpivot,
        "t14_domain_mix": t14_domain_mix,
        # rotated out of the first-50 window for the round-9 second- and
        # third-wave ops (all externally checked in r8; families stay
        # in-window: w1 for windows, q3/q21 for TPC-H, t1/t17 for text)
        "w2_window_lead_movavg": w2_window_lead_movavg,
        "q9_product_profit": q9_product_profit,
        "t8_tfidf_topterms": t8_tfidf_topterms,
        "q18_large_volume_customer": q18_large_volume_customer,
        # round 10 additions: the amortized snapshot paths as
        # first-class driver-checkable probes (VERDICT r9 task 3) —
        # each builds its persisted index/reference, then runs the
        # production probe against the parquet snapshot; oracles are
        # shared verbatim with the inline siblings (the snapshot
        # roundtrip is lossless by construction and equality-tested in
        # pytest)
        # round 10: the hybrid BPE tier under the same oracle as bpe1
        # round 10: unigram-LM perplexity quality filter (CCNet-class)
        # round 10: capstone composing the t19 gate into t18's mix
    }


def _d7_ctes() -> str:
    """The d7 CTE chain (shared with cp4's oracle): d5's transitive
    closure over exact 8-gram Jaccard >= 0.2 pairs + t3's quality score
    + the coalesced cluster assignment.  Ends with ``assigned``
    (doc_id, cluster_id, quality)."""
    return """
            sh AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 8) AS shingle
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
            ), counts AS (
              SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            ), prs AS (
              SELECT id_a, id_b FROM inter
              JOIN counts ca ON ca.doc_id = id_a
              JOIN counts cb ON cb.doc_id = id_b
              WHERE CAST(n_inter AS DOUBLE) /
                    (ca.n_shingles + cb.n_shingles - n_inter) >= 0.2
            ), sym AS (
              SELECT id_a AS src, id_b AS dst FROM prs
              UNION ALL
              SELECT id_b, id_a FROM prs
            ), reach(src, dst) AS (
              SELECT src, dst FROM sym
              UNION
              SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
            ), clusters AS (
              SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
              FROM reach GROUP BY src
            ), q AS (
              SELECT doc_id,
                     round((least(n_words / 20.0, 1.0)
                            + (1.0 - least(punct_ratio * 5, 1.0))
                            + least(stopword_ratio * 4, 1.0)) / 3.0, 6) AS quality
              FROM (
                SELECT doc_id,
                       len(string_split(text, ' ')) AS n_words,
                       round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                             AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio,
                       round(CAST(len(list_filter(string_split(text, ' '),
                             w -> lower(w) IN ('the','and','of','to','a','in','is','it','for','on')))
                             AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6)
                         AS stopword_ratio
                FROM documents
              )
            ), assigned AS (
              SELECT q.doc_id,
                     coalesce(c.cluster_id, q.doc_id) AS cluster_id,
                     q.quality
              FROM q LEFT JOIN clusters c ON q.doc_id = c.doc_id
            )"""


def _bpe_oracle_sql(
    k: int = 5,
    tokens: bool = False,
    source: str = "documents",
    prefix_ctes: str = "",
    tokens_extra_cols: str = "",
) -> str:
    """Unrolled-CTE twin of textstats.bpe_merges: round i counts symbol
    pairs of w{i-1}, b{i} is the (cnt DESC, l ASC, r ASC) argmax, w{i}
    applies the greedy replace() merge — formulation shared verbatim
    with the Spark side via the per-symbol ``|...|`` wrapper encoding.
    The b{i}/m CTEs are MATERIALIZED: without it DuckDB inlines the
    scalar subqueries and re-runs the whole learning chain per consumer
    row (measured: the tokens variant went 128 s → 0.2 s at sf0.01).
    With ``tokens=True`` returns the bpe2 twin instead: per-document
    token counts under the k learned merges.  ``source`` names the
    table/CTE the corpus is read from; ``prefix_ctes`` splices upstream
    CTEs (e.g. cp4's canonicalization chain) before the BPE rounds."""

    def rnd(i: int) -> str:
        return f"""
            c{i} AS (
              SELECT l, r, SUM(freq) AS cnt FROM (
                SELECT freq, syms[i] AS l, syms[i+1] AS r
                FROM (SELECT freq, string_split(trim(seq, '|'), '||') AS syms
                      FROM w{i - 1}),
                     unnest(generate_series(1, len(syms) - 1)) AS t(i)
              ) GROUP BY l, r
            ), b{i} AS MATERIALIZED (
              SELECT l, r, CAST(cnt AS BIGINT) AS cnt FROM c{i}
              ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
            ), w{i} AS (
              SELECT replace(seq,
                  '|' || (SELECT l FROM b{i}) || '||' || (SELECT r FROM b{i}) || '|',
                  '|' || (SELECT l FROM b{i}) || (SELECT r FROM b{i}) || '|') AS seq,
                  freq
              FROM w{i - 1}
            )"""

    head = f"""
            WITH {prefix_ctes + "," if prefix_ctes else ""} w0 AS (
              SELECT regexp_replace(w, '(?s)(.)', '|\\1|', 'g') AS seq,
                     CAST(COUNT(*) AS BIGINT) AS freq
              FROM (SELECT unnest(string_split(text, ' ')) AS w
                    FROM {source} WHERE text IS NOT NULL)
              WHERE length(w) > 0 AND NOT contains(w, '|')
              GROUP BY 1
            ),"""
    body = head + ",".join(rnd(i) for i in range(1, k + 1))
    if not tokens:
        tail = " UNION ALL ".join(
            f"SELECT CAST({i} AS INTEGER) AS merge_rank, l AS left_sym,"
            f" r AS right_sym, cnt AS pair_count FROM b{i}"
            for i in range(1, k + 1)
        )
        return body + "\n" + tail
    m = (
        ", m AS MATERIALIZED (SELECT "
        + ", ".join(
            f"(SELECT l FROM b{i}) AS l{i}, (SELECT r FROM b{i}) AS r{i}"
            for i in range(1, k + 1)
        )
        + ")"
    )
    # each level is NULL-guarded: a corpus with fewer than k mergeable
    # pairs leaves b{i} empty, m's l{i}/r{i} NULL, and an unguarded
    # replace(seq, NULL, NULL) would poison the whole chain to NULL
    # n_tokens — the Spark side applies only the actually-learned
    # merges, so the oracle must no-op the missing rounds too
    seq = "regexp_replace(w, '(?s)(.)', '|\\1|', 'g')"
    for i in range(1, k + 1):
        seq = (
            f"CASE WHEN l{i} IS NULL THEN {seq}"
            f" ELSE replace({seq}, '|' || l{i} || '||' || r{i} || '|',"
            f" '|' || l{i} || r{i} || '|') END"
        )
    return (
        body
        + m
        + f"""
            SELECT doc_id,{tokens_extra_cols}
                   CAST(list_sum(list_transform(string_split(text, ' '),
                     w -> CASE WHEN length(w) = 0 OR contains(w, '|') THEN 0
                               ELSE len(string_split(trim({seq}, '|'), '||'))
                          END)) AS BIGINT) AS n_tokens
            FROM {source}, m
        """
    )


def oracle_sql() -> dict[str, str]:
    from maple_spark.functions import phash as _ph

    # --- d3/d4: engine-portable md5 fingerprints (functions/phash.py) ---
    # The hash is the builder's free choice, so it was chosen to be
    # computable natively by BOTH engines: md5-hex → BIGINT, then plain
    # arithmetic.  These twins replay the Spark pipeline exactly — no
    # UDF tier, the driver's vanilla DuckDB runs them as-is.
    _mh_vals = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(_ph.perm_consts(64))
    )
    _mh_bucket = _ph.sql_poly_bucket(
        [f"hs[CAST(b * 4 + {j + 1} AS INTEGER)]" for j in range(4)]
    )
    _sh_fp = _ph.sql_fp60("substr(text, CAST(i AS INTEGER), 8)")
    d3_oracle = f"""
            WITH consts(perm, a, b) AS (VALUES {_mh_vals}),
            baseh AS (
              -- min over the shingle multiset == min over the distinct set
              SELECT DISTINCT doc_id, ({_sh_fp} % {_ph.P31}) AS r
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
            ), sig AS (
              SELECT doc_id, perm, MIN((a * r + b) % {_ph.P31}) AS mh
              FROM baseh CROSS JOIN consts
              GROUP BY doc_id, perm
            ), sigl AS (
              SELECT doc_id, list(mh ORDER BY perm) AS hs FROM sig GROUP BY doc_id
            ), bands AS (
              SELECT doc_id, CAST(b AS INTEGER) AS band, {_mh_bucket} AS bucket
              FROM sigl, unnest(generate_series(0, 15)) AS g(b)
            ), cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                          AND a.doc_id < b.doc_id
            ), sh AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 8) AS shingle
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
            ), counts AS (
              SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
              FROM cand c
              JOIN sh a ON a.doc_id = c.id_a
              JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
              GROUP BY c.id_a, c.id_b
            )
            SELECT id_a, id_b,
                   round(CAST(n_inter AS DOUBLE) /
                         (ca.n_shingles + cb.n_shingles - n_inter), 6) AS jaccard
            FROM inter
            JOIN counts ca ON ca.doc_id = id_a
            JOIN counts cb ON cb.doc_id = id_b
            WHERE round(CAST(n_inter AS DOUBLE) /
                        (ca.n_shingles + cb.n_shingles - n_inter), 6) >= 0.2
        """
    # d6 reuses d3's banding CTEs; only the candidate join differs (ACROSS
    # the parity-split corpora, never within) and the output orientation
    # is (new_id, ref_id)
    d6_oracle = f"""
            WITH consts(perm, a, b) AS (VALUES {_mh_vals}),
            baseh AS (
              SELECT DISTINCT doc_id, ({_sh_fp} % {_ph.P31}) AS r
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
            ), sig AS (
              SELECT doc_id, perm, MIN((a * r + b) % {_ph.P31}) AS mh
              FROM baseh CROSS JOIN consts
              GROUP BY doc_id, perm
            ), sigl AS (
              SELECT doc_id, list(mh ORDER BY perm) AS hs FROM sig GROUP BY doc_id
            ), bands AS (
              SELECT doc_id, CAST(b AS INTEGER) AS band, {_mh_bucket} AS bucket
              FROM sigl, unnest(generate_series(0, 15)) AS g(b)
            ), cand AS (
              SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
              WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
            ), sh AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 8) AS shingle
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
            ), counts AS (
              SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT c.new_id, c.ref_id, COUNT(*) AS n_inter
              FROM cand c
              JOIN sh a ON a.doc_id = c.new_id
              JOIN sh b ON b.doc_id = c.ref_id AND b.shingle = a.shingle
              GROUP BY c.new_id, c.ref_id
            )
            SELECT new_id, ref_id,
                   round(CAST(n_inter AS DOUBLE) /
                         (ca.n_shingles + cb.n_shingles - n_inter), 6) AS jaccard
            FROM inter
            JOIN counts ca ON ca.doc_id = new_id
            JOIN counts cb ON cb.doc_id = ref_id
            WHERE round(CAST(n_inter AS DOUBLE) /
                        (ca.n_shingles + cb.n_shingles - n_inter), 6) >= 0.2
        """

    # cp3: the d6 dedup chain feeding decontamination → quality → quota
    # → packing, all in one statement (stage expressions identical to
    # the t11/t3/t6/t10 oracles they compose)
    cp3_oracle = f"""
            WITH consts(perm, a, b) AS (VALUES {_mh_vals}),
            baseh AS (
              SELECT DISTINCT doc_id, ({_sh_fp} % {_ph.P31}) AS r
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
            ), sig AS (
              SELECT doc_id, perm, MIN((a * r + b) % {_ph.P31}) AS mh
              FROM baseh CROSS JOIN consts
              GROUP BY doc_id, perm
            ), sigl AS (
              SELECT doc_id, list(mh ORDER BY perm) AS hs FROM sig GROUP BY doc_id
            ), bands AS (
              SELECT doc_id, CAST(b AS INTEGER) AS band, {_mh_bucket} AS bucket
              FROM sigl, unnest(generate_series(0, 15)) AS g(b)
            ), cand AS (
              SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
              WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
            ), shd AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 8) AS shingle
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
            ), cnts AS (
              SELECT doc_id, COUNT(*) AS n_shingles FROM shd GROUP BY doc_id
            ), inter AS (
              SELECT c.new_id, c.ref_id, COUNT(*) AS n_inter
              FROM cand c
              JOIN shd a ON a.doc_id = c.new_id
              JOIN shd b ON b.doc_id = c.ref_id AND b.shingle = a.shingle
              GROUP BY c.new_id, c.ref_id
            ), dup_ids AS (
              SELECT DISTINCT new_id AS doc_id
              FROM inter
              JOIN cnts ca ON ca.doc_id = new_id
              JOIN cnts cb ON cb.doc_id = ref_id
              WHERE round(CAST(n_inter AS DOUBLE) /
                          (ca.n_shingles + cb.n_shingles - n_inter), 6) >= 0.2
            ), survivors AS (
              SELECT d.* FROM documents d
              WHERE d.doc_id % 2 = 1
                AND d.doc_id NOT IN (SELECT doc_id FROM dup_ids)
            ), kw AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM survivors
            ), dgk AS (
              SELECT DISTINCT doc_id, array_to_string(ws[i:i+12], ' ') AS gram
              FROM kw, UNNEST(generate_series(1, len(ws) - 12)) AS t(i)
              WHERE len(ws) >= 13
            ), bw AS (
              SELECT string_split(text, ' ') AS ws FROM documents
              WHERE doc_id % 50 = 0
            ), bg AS (
              SELECT DISTINCT array_to_string(ws[i:i+12], ' ') AS gram
              FROM bw, UNNEST(generate_series(1, len(ws) - 12)) AS t(i)
              WHERE len(ws) >= 13
            ), contaminated AS (
              SELECT DISTINCT doc_id FROM dgk JOIN bg USING (gram)
            ), clean AS (
              SELECT s.* FROM survivors s
              WHERE s.doc_id NOT IN (SELECT doc_id FROM contaminated)
            ), kept AS (
              SELECT doc_id, lang, quality FROM (
                SELECT doc_id, lang,
                       round((least(n_words / 20.0, 1.0)
                              + (1.0 - least(punct_ratio * 5, 1.0))
                              + least(stopword_ratio * 4, 1.0)) / 3.0, 6)
                         AS quality
                FROM (
                  SELECT doc_id, lang,
                         len(string_split(text, ' ')) AS n_words,
                         round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                               AS DOUBLE) / greatest(length(text), 1), 6)
                           AS punct_ratio,
                         round(CAST(len(list_filter(string_split(text, ' '),
                               w -> lower(w) IN ('the','and','of','to','a','in','is','it','for','on')))
                               AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6)
                           AS stopword_ratio
                  FROM clean
                )
              ) WHERE quality >= 0.4
            ), capped AS (
              SELECT doc_id, lang, quality FROM (
                SELECT k.*,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY doc_id ASC) AS rk
                FROM kept k
              ) WHERE rk <= 40
            ), toks AS (
              SELECT c.doc_id, c.lang, c.quality, c.doc_id % 16 AS shard,
                     CAST(len(list_filter(string_split(d.text, ' '),
                                          x -> x <> '')) AS BIGINT)
                       AS n_tokens
              FROM capped c JOIN documents d ON d.doc_id = c.doc_id
            ), cum AS (
              SELECT doc_id, lang, quality, shard, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING)
                       - n_tokens AS start_tok
              FROM toks
            )
            SELECT doc_id, lang, quality, shard, n_tokens,
                   CAST(FLOOR(start_tok / 2048.0) AS BIGINT) AS pack_id,
                   CAST(start_tok % 2048 AS BIGINT) AS pack_offset
            FROM cum
        """

    # cp6: the incremental production regime — gopher gate (t24's raw
    # double comparisons) → reference-fit bigram LM band (t20's term
    # discipline, model CTEs FROM the parity reference half) → d6's
    # LSH candidate + exact-Jaccard verify restricted to the surviving
    # increment.  tot/q are MATERIALIZED (scalar-subquery / 3-consumer
    # CTEs — the bpe2 lesson).
    cp6_oracle = f"""
            WITH ginc AS MATERIALIZED (
              SELECT doc_id FROM (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '')
                         AS ws,
                       string_split(text, chr(10)) AS ls,
                       text
                FROM documents WHERE doc_id % 2 = 1
              )
              WHERE len(ws) >= 30 AND len(ws) <= 100000
                AND (CASE WHEN len(ws) > 0 THEN
                      length(array_to_string(ws, '')) / len(ws) END)
                    BETWEEN 3.0 AND 10.0
                AND (CASE WHEN len(ws) > 0 THEN
                      (len(regexp_extract_all(text, '#'))
                       + len(regexp_extract_all(text, '\\.\\.\\.')))
                      / len(ws) END) <= 0.1
                AND (CASE WHEN len(ws) > 0 THEN
                      len(list_filter(ls, l -> l LIKE '- %'
                                           OR l LIKE '* %'
                                           OR l LIKE '•%'))
                      / len(ls) END) <= 0.9
                AND (CASE WHEN len(ws) > 0 THEN
                      len(list_filter(ls, l -> l LIKE '%...'))
                      / len(ls) END) <= 0.3
                AND (CASE WHEN len(ws) > 0 THEN
                      len(list_filter(ws,
                          w -> regexp_matches(w, '[A-Za-z]')))
                      / len(ws) END) >= 0.8
                AND (CASE WHEN len(ws) > 0 THEN
                      len(list_filter(
                        ['the','be','to','of','and','that','have','with'],
                        s -> list_contains(ws, s))) END) >= 1
            ), rt AS (
              SELECT list_filter(string_split(text, ' '), x -> x <> '')
                       AS arr
              FROM documents
              WHERE text IS NOT NULL AND doc_id % 2 = 0
            ), re AS (
              SELECT CASE WHEN i > 1 THEN arr[i - 1] END AS prev,
                     arr[i] AS cur
              FROM rt, unnest(generate_series(1, len(arr))) AS t(i)
              WHERE len(arr) > 0
            ), uv AS MATERIALIZED (
              SELECT cur AS w, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM re GROUP BY cur
            ), tot AS MATERIALIZED (
              SELECT SUM(cnt) AS total FROM uv
            ), bm AS MATERIALIZED (
              SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS bcnt
              FROM re WHERE prev IS NOT NULL GROUP BY prev, cur
            ), gt AS (
              SELECT d.doc_id,
                     list_filter(string_split(d.text, ' '), x -> x <> '')
                       AS arr
              FROM documents d JOIN ginc USING (doc_id)
              WHERE d.text IS NOT NULL
            ), ge AS (
              SELECT doc_id,
                     CASE WHEN i > 1 THEN arr[i - 1] END AS prev,
                     arr[i] AS cur
              FROM gt, unnest(generate_series(1, len(arr))) AS t(i)
              WHERE len(arr) > 0
            ), gw AS MATERIALIZED (
              SELECT doc_id, prev, cur, CAST(COUNT(*) AS BIGINT) AS m
              FROM ge GROUP BY doc_id, prev, cur
            ), s AS (
              SELECT w.doc_id,
                     CAST(SUM(w.m) AS BIGINT) AS n_words,
                     CAST(SUM(CASE WHEN uc.cnt IS NULL THEN w.m ELSE 0 END)
                          AS BIGINT) AS n_oov,
                     SUM(CAST(CAST(w.m AS DOUBLE) * (CASE
                        WHEN w.prev IS NULL THEN
                          ln(CAST(coalesce(uc.cnt, 1) AS DOUBLE))
                          - ln(CAST((SELECT total FROM tot) AS DOUBLE))
                        WHEN b.bcnt IS NOT NULL THEN
                          ln(CAST(b.bcnt AS DOUBLE))
                          - ln(CAST(up.cnt AS DOUBLE))
                        ELSE ln(0.4)
                          + ln(CAST(coalesce(uc.cnt, 1) AS DOUBLE))
                          - ln(CAST((SELECT total FROM tot) AS DOUBLE))
                      END) AS DECIMAL(38,12))) AS slc
              FROM gw w
              LEFT JOIN uv uc ON uc.w = w.cur
              LEFT JOIN uv up ON up.w = w.prev
              LEFT JOIN bm b ON b.prev = w.prev AND b.cur = w.cur
              GROUP BY w.doc_id
            ), q AS MATERIALIZED (
              SELECT doc_id, n_words, n_oov,
                     round(-CAST(slc AS DOUBLE) / n_words, 6) AS xent
              FROM s
              WHERE round(-CAST(slc AS DOUBLE) / n_words, 6) <= 3.46
            ), consts(perm, a, b) AS (VALUES {_mh_vals}),
            baseh AS (
              SELECT DISTINCT doc_id, ({_sh_fp} % {_ph.P31}) AS r
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
              WHERE doc_id % 2 = 0 OR doc_id IN (SELECT doc_id FROM q)
            ), sig AS (
              SELECT doc_id, perm, MIN((a * r + b) % {_ph.P31}) AS mh
              FROM baseh CROSS JOIN consts
              GROUP BY doc_id, perm
            ), sigl AS (
              SELECT doc_id, list(mh ORDER BY perm) AS hs
              FROM sig GROUP BY doc_id
            ), bands AS (
              SELECT doc_id, CAST(b AS INTEGER) AS band, {_mh_bucket} AS bucket
              FROM sigl, unnest(generate_series(0, 15)) AS g(b)
            ), cand AS (
              SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
              WHERE a.doc_id IN (SELECT doc_id FROM q)
                AND b.doc_id % 2 = 0
            ), sh AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 8) AS shingle
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
              WHERE doc_id % 2 = 0 OR doc_id IN (SELECT doc_id FROM q)
            ), counts AS (
              SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT c.new_id, c.ref_id, COUNT(*) AS n_inter
              FROM cand c
              JOIN sh a ON a.doc_id = c.new_id
              JOIN sh b ON b.doc_id = c.ref_id AND b.shingle = a.shingle
              GROUP BY c.new_id, c.ref_id
            ), dup AS (
              SELECT DISTINCT new_id
              FROM inter
              JOIN counts ca ON ca.doc_id = new_id
              JOIN counts cb ON cb.doc_id = ref_id
              WHERE round(CAST(n_inter AS DOUBLE) /
                          (ca.n_shingles + cb.n_shingles - n_inter), 6)
                    >= 0.2
            )
            SELECT doc_id, n_words, n_oov, xent FROM q
            WHERE doc_id NOT IN (SELECT new_id FROM dup)
        """

    _tok_h1 = _ph.sql_fp60("t.tok")
    _tok_h2 = _ph.sql_fp_nib("t.tok")
    d4_oracle = f"""
            WITH tok AS (
              SELECT doc_id, {_tok_h1} AS h1, {_tok_h2} AS h2
              FROM documents,
                   unnest(regexp_split_to_array(text, '\\s+')) AS t(tok)
              WHERE length(t.tok) > 0
            ), bits AS (
              SELECT doc_id, CAST(b AS INTEGER) AS b,
                     SUM(CASE WHEN (CASE WHEN b < 60 THEN (h1 >> b) & 1
                                    ELSE (h2 >> (b - 60)) & 1 END) = 1
                              THEN 1 ELSE -1 END) AS s
              FROM tok, unnest(generate_series(0, 63)) AS g(b)
              GROUP BY doc_id, b
            ), fp AS (
              SELECT doc_id,
                     CAST(SUM(CASE WHEN s > 0 THEN
                       CASE WHEN b = 63 THEN -9223372036854775808
                            ELSE (CAST(1 AS BIGINT) << b) END
                       ELSE 0 END) AS BIGINT) AS simhash
              FROM bits GROUP BY doc_id
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER)
                     AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """

    dsum = lambda col, alias, s=2: (
        f"CAST(SUM(CAST({col} AS DECIMAL(38,{s}))) AS DOUBLE) AS {alias}"
    )
    davg = lambda col, alias, s=2: (
        f"CAST(SUM(CAST({col} AS DECIMAL(38,{s}))) AS DOUBLE) / COUNT({col}) AS {alias}"
    )

    # --- sim4: deterministic-Lloyd IVF, pure SQL (no UDFs needed) -------
    # Mirrors ivf_topk exactly: init = 8 smallest-id vectors, two Lloyd
    # rounds (argmin squared-L2 with left-to-right fold = list_reduce,
    # ties to the lowest cell = list_position-of-min; per-cell means
    # summed in DECIMAL(38,12) — exact, order-independent — then one
    # double division), final assignment, 3-probe search, exact rerank.
    _ivf_dist = (
        "list_transform({cents}, c -> list_reduce("
        "list_transform(generate_series(1, 64),"
        " j -> (({v})[j] - c[j]) * (({v})[j] - c[j])), (a, b) -> a + b))"
    )

    def _ivf_assign(name, src, cents):
        d = _ivf_dist.format(cents=cents, v="v")
        return (
            f"{name} AS (SELECT vec_id, v,"
            f" list_position(d, list_aggregate(d, 'min')) - 1 AS cell"
            f" FROM (SELECT vec_id, v, {d} AS d FROM {src}))"
        )

    def _ivf_update(prev_assign, prev_cents, out):
        return f"""{out}_s AS (
              SELECT cell, g.j AS pos,
                     CAST(SUM(CAST(v[g.j] AS DECIMAL(38,12))) AS DOUBLE)
                       / COUNT(*) AS m
              FROM {prev_assign}, unnest(generate_series(1, 64)) AS g(j)
              GROUP BY cell, g.j
            ), {out}_cv AS (
              SELECT cell, list(m ORDER BY pos) AS cv FROM {out}_s GROUP BY cell
            ), {out} AS (
              SELECT list(COALESCE({out}_cv.cv, ic.cv) ORDER BY ic.cell)
                AS cents
              FROM (SELECT g.j - 1 AS cell, {prev_cents}.cents[g.j] AS cv
                    FROM {prev_cents},
                         unnest(generate_series(1, 8)) AS g(j)) ic
              LEFT JOIN {out}_cv ON {out}_cv.cell = ic.cell
            )"""

    sim4_oracle = f"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), init AS (
              SELECT list(v ORDER BY vec_id) AS cents
              FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
            ),
            {_ivf_assign("a1", "e, init", "init.cents")},
            {_ivf_update("a1", "init", "cents1")},
            {_ivf_assign("a2", "e, cents1", "cents1.cents")},
            {_ivf_update("a2", "cents1", "cents2")},
            {_ivf_assign("a3", "e, cents2", "cents2.cents")},
            probes AS (
              SELECT query_id, qvec, cell FROM (
                SELECT query_id, qvec, g.j - 1 AS cell,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY d[g.j] ASC, g.j ASC)
                         AS rk
                FROM (SELECT q.vec_id AS query_id, q.v AS qvec,
                             {_ivf_dist.format(cents="cents2.cents", v="q.v")}
                               AS d
                      FROM (SELECT vec_id, v FROM e WHERE vec_id < 10) q,
                           cents2),
                     unnest(generate_series(1, 8)) AS g(j)
              ) WHERE rk <= 3
            ), cand AS (
              SELECT p.query_id, a.vec_id AS neighbor_id,
                     list_cosine_similarity(p.qvec, a.v) AS cosine
              FROM probes p JOIN a3 a ON a.cell = p.cell
              WHERE p.query_id <> a.vec_id
            )
            SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r FROM (
              SELECT query_id, neighbor_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id ASC)
                       AS rk
              FROM cand) WHERE rk <= 5
        """
    # --- sim5: same quantizer CTE chain, pairwise shadowing rule --------
    sim5_oracle = f"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), init AS (
              SELECT list(v ORDER BY vec_id) AS cents
              FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)
            ),
            {_ivf_assign("a1", "e, init", "init.cents")},
            {_ivf_update("a1", "init", "cents1")},
            {_ivf_assign("a2", "e, cents1", "cents1.cents")},
            {_ivf_update("a2", "cents1", "cents2")},
            {_ivf_assign("a3", "e, cents2", "cents2.cents")},
            dup AS (
              SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS dup_of
              FROM a3 a JOIN a3 b
                ON a.cell = b.cell AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.v, b.v) >= 0.4
              GROUP BY b.vec_id
            )
            SELECT a3.vec_id, CAST(a3.cell AS INTEGER) AS cell,
                   dup.dup_of IS NULL AS keep, dup.dup_of AS dup_of
            FROM a3 LEFT JOIN dup ON a3.vec_id = dup.vec_id
        """
    out = {
        "sim4_ivf_topk": sim4_oracle,
        # the snapshot probes share their inline siblings' oracles
        # verbatim: the persisted index is a lossless parquet roundtrip
        # of the same training/banding, so the correct answer set is
        # identical by construction (and equality-tested in pytest)
        "sim4s_ivf_snapshot_topk": sim4_oracle,
        "sim5_semdedup": sim5_oracle,
        "flagship_join_topk": FLAGSHIP_ORACLE,
        "s1_scan_filter": """
            SELECT l_orderkey, l_linenumber, l_quantity,
                   strftime(l_shipdate, '%Y-%m-%d %H:%M:%S.%f') AS l_shipdate
            FROM lineitem
            WHERE l_quantity > 45 AND l_shipdate < TIMESTAMP '1996-01-01'
        """,
        "p1_project_expr": """
            SELECT p_partkey, p_retailprice * 0.9 AS discounted,
                   p_size + 10 AS size_plus, upper(p_brand) AS brand_uc
            FROM part
        """,
        "p4_rename": """
            SELECT n.n_name AS nation_name, r.r_name AS region_name
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        """,
        "e1_arithmetic": """
            SELECT l_orderkey, l_linenumber,
                   l_quantity + l_tax AS add_qt,
                   l_quantity - l_discount AS sub_qd,
                   l_extendedprice * l_discount AS mul_pd,
                   CAST(l_quantity AS DOUBLE) / 2.0 AS half_q,
                   l_linenumber % 3 AS mod_l3,
                   -l_quantity AS neg_q
            FROM lineitem WHERE l_orderkey % 100 = 0
        """,
        "e3_null_compare": """
            SELECT o_orderkey, nullif(o_totalprice, 0.0) AS maybe_price,
                   nullif(o_orderstatus, 'O') AS maybe_status
            FROM orders WHERE nullif(o_orderstatus, 'O') = 'F'
        """,
        "e5_between": """
            SELECT p_partkey, p_size, p_brand FROM part
            WHERE p_size BETWEEN 10 AND 20
        """,
        "e6_like": """
            SELECT p_partkey, p_type FROM part WHERE p_type LIKE '%ECO%'
        """,
        "e7_similar_to": """
            SELECT c_custkey, c_name FROM customer
            WHERE regexp_matches(c_name, '[0-9]{3}$')
        """,
        "e8_in_list": """
            SELECT o_orderkey, o_orderpriority FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        """,
        "e11_is_null": """
            SELECT o_orderkey, o_orderstatus,
                   nullif(o_orderstatus, 'O') AS maybe_status
            FROM orders WHERE nullif(o_orderstatus, 'O') IS NULL
        """,
        "e13_scalar_funcs": """
            SELECT p_partkey,
                   abs(p_size - 25) AS abs_v,
                   CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS ceil_v,
                   CAST(floor(p_retailprice / 100.0) AS BIGINT) AS floor_v,
                   round(p_retailprice * 0.1, 2) AS round_v,
                   sqrt(CAST(p_size AS DOUBLE)) AS sqrt_v,
                   pow(2.0, CAST(p_size % 10 AS DOUBLE)) AS pow_v,
                   p_brand || '/' || p_type AS concat_v,
                   greatest(p_size, 25) AS greatest_v,
                   least(p_size, 25) AS least_v,
                   coalesce(nullif(p_size, 25), -1) AS coalesce_v,
                   ifnull(nullif(p_size, 25), -1) AS ifnull_v,
                   nullif(p_size, 25) AS nullif_v,
                   CASE WHEN p_size > 25 THEN 'big' ELSE 'small' END AS if_v
            FROM part WHERE p_partkey <= 500
        """,
        "e13_trig_funcs": """
            SELECT p_partkey,
                   round(sin(x), 6) AS sin_v, round(cos(x), 6) AS cos_v,
                   round(tan(x), 6) AS tan_v, round(asin(x), 6) AS asin_v,
                   round(acos(x), 6) AS acos_v, round(atan(x), 6) AS atan_v,
                   round(atan2(x, 2.0), 6) AS atan2_v
            FROM (SELECT p_partkey, CAST(p_size % 10 AS DOUBLE) / 10.0 AS x
                  FROM part WHERE p_partkey <= 200)
        """,
        "str1_string_funcs": """
            SELECT c_custkey,
                   upper(c_name) AS uc, lower(c_name) AS lc,
                   trim('  ' || c_name || ' ') AS trimmed,
                   substring(c_name, 10, 5) AS sub,
                   regexp_replace(c_name, '0', '#', 'g') AS replaced,
                   reverse(c_name) AS rev,
                   lpad(c_mktsegment, 12, '.') AS padded,
                   CAST(strpos(c_name, '1') AS BIGINT) AS pos1,
                   concat_ws('|', c_name, c_mktsegment) AS joined,
                   CAST(length(c_name) AS BIGINT) AS len
            FROM customer WHERE c_custkey <= 400
        """,
        "j2_join_inner": """
            SELECT s_suppkey, s_name, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
        """,
        "j3_sort_merge_join": f"""
            SELECT o_orderpriority, COUNT(*) AS n_items,
                   {dsum("l_quantity", "sum_qty")}
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "j4_join_left": """
            SELECT c_custkey, c_name, o_orderkey, o_totalprice
            FROM customer LEFT JOIN
                 (SELECT * FROM orders WHERE o_totalprice > 400000) o
                 ON c_custkey = o.o_custkey
        """,
        "j4_join_right": """
            SELECT c_custkey, c_name, o_orderkey, o_totalprice
            FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
                 RIGHT JOIN customer ON o.o_custkey = c_custkey
        """,
        "j4_join_full": """
            SELECT o_orderkey, o_custkey, c_custkey, c_name
            FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
                 FULL JOIN
                 (SELECT * FROM customer WHERE c_acctbal < 0) c
                 ON o.o_custkey = c.c_custkey
        """,
        "j5_using_join": """
            SELECT regionkey, n_name, r_name
            FROM (SELECT n_regionkey AS regionkey, n_name FROM nation) n
                 JOIN (SELECT r_regionkey AS regionkey, r_name FROM region) r
                 USING (regionkey)
        """,
        "j5_natural_join": """
            SELECT orderkey, partkey, qty, price
            FROM (SELECT l_orderkey AS orderkey, l_partkey AS partkey,
                         l_quantity AS qty
                  FROM lineitem WHERE l_orderkey < 2000) a
                 NATURAL JOIN
                 (SELECT l_orderkey AS orderkey, l_partkey AS partkey,
                         l_extendedprice AS price
                  FROM lineitem WHERE l_orderkey < 2000 AND l_quantity > 25) b
        """,
        "j6_cross_join": """
            SELECT r_name, n_name FROM region CROSS JOIN nation
        """,
        "j7_semi_in_subquery": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 300000)
        """,
        "j7_anti_not_exists": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE c.c_custkey = o.o_custkey
                                AND o.o_totalprice > 450000)
        """,
        "e10_scalar_subquery": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_totalprice >
              (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
                      / COUNT(o_totalprice)
               FROM orders)
        """,
        "a2_groupby_q1": f"""
            SELECT l_returnflag, l_linestatus,
                   {dsum("l_quantity", "sum_qty")},
                   {dsum("l_extendedprice", "sum_base_price")},
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                        AS DOUBLE) AS sum_disc_price,
                   {davg("l_quantity", "avg_qty")},
                   {davg("l_discount", "avg_disc")},
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "a4_count_distinct": """
            SELECT l_returnflag, COUNT(*) AS n_rows,
                   COUNT(l_quantity) AS n_qty,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   COUNT(DISTINCT l_partkey) AS n_part
            FROM lineitem GROUP BY l_returnflag
        """,
        "a6_minmax_sumavg": f"""
            SELECT o_orderpriority,
                   MIN(o_totalprice) AS min_price,
                   MAX(o_totalprice) AS max_price,
                   {dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", "sum_f_price")},
                   {davg("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", "avg_f_price")},
                   COUNT(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS n_f
            FROM orders GROUP BY o_orderpriority
        """,
        "a7_having": f"""
            SELECT l_suppkey, COUNT(*) AS n_items,
                   {dsum("l_quantity", "total_qty")}
            FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 550
        """,
        "a8_distinct": """
            SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        """,
        "a9_rollup": f"""
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   {dsum("l_quantity", "sum_qty")},
                   CASE WHEN GROUPING(l_returnflag) THEN 1 ELSE 0 END AS g_flag,
                   CASE WHEN GROUPING(l_linestatus) THEN 1 ELSE 0 END AS g_status
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "o1_sort_rownum": """
            SELECT c_custkey,
                   CASE WHEN c_acctbal > 0 THEN c_acctbal END AS maybe_bal,
                   row_number() OVER (
                     ORDER BY (CASE WHEN c_acctbal > 0 THEN c_acctbal END)
                       ASC NULLS FIRST, c_custkey ASC) AS rn
            FROM customer
        """,
        "o3_topk": """
            SELECT * FROM (
              SELECT o_orderkey, o_totalprice,
                     row_number() OVER (ORDER BY o_totalprice DESC,
                                        o_orderkey ASC) AS rn
              FROM orders) WHERE rn <= 25
        """,
        "set_union": """
            SELECT c_nationkey AS nationkey FROM customer
            UNION
            SELECT s_nationkey FROM supplier
        """,
        "set_intersect": """
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey FROM supplier
        """,
        "set_except": """
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
        """,
        "w1_window_rank": """
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   rank() OVER w AS rk,
                   dense_rank() OVER w AS drk,
                   row_number() OVER w AS rn,
                   lag(o_orderkey, 1) OVER w AS prev_key,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) OVER
                        (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE) AS running_total
            FROM orders WHERE o_totalprice > 350000
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey ASC)
        """,
        "q3_shipping_priority": """
            SELECT rn, l_orderkey, revenue,
                   strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f') AS o_orderdate,
                   o_orderpriority FROM (
              SELECT row_number() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS rn,
                     l_orderkey, revenue, o_orderdate, o_orderpriority
              FROM (
                SELECT l_orderkey,
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                            AS DOUBLE) AS revenue,
                       o_orderdate, o_orderpriority
                FROM customer, orders, lineitem
                WHERE c_mktsegment = 'BUILDING'
                  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
                  AND o_orderdate < TIMESTAMP '1995-03-15'
                  AND l_shipdate > TIMESTAMP '1995-03-15'
                GROUP BY l_orderkey, o_orderdate, o_orderpriority
              )
            ) WHERE rn <= 10
        """,
        "q5_local_supplier": """
            SELECT n_name,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                        AS DOUBLE) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1994-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "t1_text_stats": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_calc,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens,
                   round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                         AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio,
                   round(CAST(len(list_filter(string_split(text, ' '),
                         w -> lower(w) IN ('the','and','of','to','a','in','is','it','for','on')))
                         AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6)
                     AS stopword_ratio,
                   round(CAST(length(text) - len(string_split(text, ' ')) + 1
                         AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6)
                     AS avg_word_len
            FROM documents
        """,
        "t2_language_id": """
            SELECT doc_id, lang, stopword_ratio,
                   CASE WHEN stopword_ratio >= 0.05 THEN 'en' ELSE 'other' END
                     AS predicted_lang
            FROM (
              SELECT doc_id, lang,
                     round(CAST(len(list_filter(string_split(text, ' '),
                           w -> lower(w) IN ('the','and','of','to','a','in','is','it','for','on')))
                           AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6)
                       AS stopword_ratio
              FROM documents
            )
        """,
        "t3_quality_score": """
            SELECT doc_id,
                   round((least(n_words / 20.0, 1.0)
                          + (1.0 - least(punct_ratio * 5, 1.0))
                          + least(stopword_ratio * 4, 1.0)) / 3.0, 6) AS quality
            FROM (
              SELECT doc_id,
                     len(string_split(text, ' ')) AS n_words,
                     round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                           AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio,
                     round(CAST(len(list_filter(string_split(text, ' '),
                           w -> lower(w) IN ('the','and','of','to','a','in','is','it','for','on')))
                           AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6)
                       AS stopword_ratio
              FROM documents
            )
        """,
        "t4_fingerprint": """
            SELECT doc_id, md5(text) AS fp_md5 FROM documents
        """,
        "d1_dedup_exact": """
            SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
                   md5(text) AS text_md5
            FROM documents GROUP BY text
        """,
        "d2_ngram_jaccard": """
            WITH sh AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 8) AS shingle
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
            ), counts AS (
              SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b,
                   round(CAST(n_inter AS DOUBLE) /
                         (ca.n_shingles + cb.n_shingles - n_inter), 6) AS jaccard
            FROM inter
            JOIN counts ca ON ca.doc_id = id_a
            JOIN counts cb ON cb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) /
                  (ca.n_shingles + cb.n_shingles - n_inter) >= 0.2
        """,
        "d3_minhash_lsh": d3_oracle,
        "d4_simhash_pairs": d4_oracle,
        "d6_cross_dedup": d6_oracle,
        # the streaming ingest guard's batch dual computes the same
        # relation (row-local banding ≡ agg banding, fingerprint-set
        # jaccard ≡ shingle-set jaccard) — oracle shared verbatim
        "st7_cross_dedup_stream": d6_oracle,
        "t16_ngram_counts": """
            WITH w AS (
              SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
              FROM documents
            ), g AS (
              SELECT ws[CAST(i AS INTEGER)] || ' '
                     || ws[CAST(i + 1 AS INTEGER)] || ' '
                     || ws[CAST(i + 2 AS INTEGER)] AS ngram
              FROM w,
                   unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
            )
            SELECT ngram, COUNT(*) AS n FROM g
            GROUP BY ngram HAVING COUNT(*) >= 5
        """,
        # t17: 15-word spans; the fingerprint replays Spark's md5-based
        # fp60 exactly, and COUNT(*) per h over distinct (doc, h) rows
        # IS the distinct-doc count (no COUNT(DISTINCT) needed)
        "t17_dup_spans": f"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(string_split(COALESCE(text, ''), ' '),
                                 x -> x <> '') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id,
                     {_phash.sql_fp60(
                         "array_to_string(list_slice(ws, CAST(i AS INTEGER),"
                         " CAST(i + 14 AS INTEGER)), ' ')"
                     )} AS h
              FROM w,
                   unnest(generate_series(1, greatest(len(ws) - 14, 0)))
                     AS t(i)
            ), gc AS (
              SELECT doc_id, h, COUNT(*) AS c FROM g GROUP BY doc_id, h
            ), dup AS (
              SELECT doc_id, c,
                     COUNT(*) OVER (PARTITION BY h) AS n_docs
              FROM gc
            ), dpd AS (
              SELECT doc_id, SUM(c) AS n_dup_spans
              FROM dup WHERE n_docs >= 2 GROUP BY doc_id
            )
            SELECT w.doc_id,
                   CAST(greatest(len(w.ws) - 14, 0) AS BIGINT) AS n_spans,
                   CAST(COALESCE(d.n_dup_spans, 0) AS BIGINT)
                     AS n_dup_spans,
                   CASE WHEN len(w.ws) - 14 > 0 THEN
                     ROUND(CAST(COALESCE(d.n_dup_spans, 0) AS DOUBLE)
                           / (len(w.ws) - 14), 6)
                   END AS dup_span_frac
            FROM w LEFT JOIN dpd d USING (doc_id)
        """,
        "d5_dedup_clusters": """
            WITH RECURSIVE sh AS (
              SELECT DISTINCT doc_id,
                     substr(text, CAST(i AS INTEGER), 8) AS shingle
              FROM documents,
                   unnest(generate_series(1, greatest(length(text) - 7, 1))) AS t(i)
            ), counts AS (
              SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            ), pairs AS (
              SELECT id_a, id_b FROM inter
              JOIN counts ca ON ca.doc_id = id_a
              JOIN counts cb ON cb.doc_id = id_b
              WHERE CAST(n_inter AS DOUBLE) /
                    (ca.n_shingles + cb.n_shingles - n_inter) >= 0.2
            ), sym AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b, id_a FROM pairs
            ), reach(src, dst) AS (
              SELECT src, dst FROM sym
              UNION
              SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
            )
            SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
            FROM reach GROUP BY src
        """,
        "t5_hash_split": """
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'valid'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id,
                     CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                          AS BIGINT) % 100 AS bucket
              FROM documents
            )
        """,
        "t6_quota_sample": """
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     row_number() OVER (PARTITION BY lang ORDER BY doc_id ASC) AS rk
              FROM documents
            ) WHERE rk <= 30
        """,
        "cp1_corpus_pipeline": """
            WITH scored AS (
              SELECT doc_id,
                     round((least(n_words / 20.0, 1.0)
                            + (1.0 - least(punct_ratio * 5, 1.0))
                            + least(stopword_ratio * 4, 1.0)) / 3.0, 6) AS quality
              FROM (
                SELECT doc_id,
                       len(string_split(text, ' ')) AS n_words,
                       round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                             AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio,
                       round(CAST(len(list_filter(string_split(text, ' '),
                             w -> lower(w) IN ('the','and','of','to','a','in','is','it','for','on')))
                             AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6)
                         AS stopword_ratio
                FROM documents
              )
            ), kept AS (
              SELECT d.doc_id, d.text, d.lang, s.quality
              FROM documents d JOIN scored s ON d.doc_id = s.doc_id
              WHERE s.quality >= 0.5
            ), deduped AS (
              SELECT doc_id, lang, quality FROM (
                SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id ASC) AS rn
                FROM kept
              ) WHERE rn = 1
            ), split AS (
              SELECT doc_id, lang, quality, bucket,
                     CASE WHEN bucket < 80 THEN 'train'
                          WHEN bucket < 90 THEN 'valid'
                          ELSE 'test' END AS split
              FROM (
                SELECT *,
                       CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                            AS BIGINT) % 100 AS bucket
                FROM deduped
              )
            )
            SELECT doc_id, lang, split, quality FROM (
              SELECT *, row_number() OVER (PARTITION BY lang, split
                                           ORDER BY doc_id ASC) AS rk
              FROM split
            ) WHERE rk <= 40
        """,
        "sim1_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id,
                              CAST(embedding AS DOUBLE[]) AS qvec
                       FROM embeddings WHERE vec_id < 10),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qvec,
                       CAST(e.embedding AS DOUBLE[])) AS cosine
              FROM q CROSS JOIN embeddings e
              WHERE q.query_id <> e.vec_id
            )
            SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r FROM (
              SELECT query_id, neighbor_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id ASC) AS rk
              FROM scored) WHERE rk <= 5
        """,
        "sim6_quantized_topk": """
            WITH base AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                             x -> abs(x))) AS s
              FROM embeddings
            ), q8 AS (
              -- floor(x*127/s + 0.5): the operator's DEFINED rounding,
              -- exact integer levels in doubles on both engines
              SELECT vec_id,
                     CASE WHEN s IS NULL OR s = 0
                          THEN list_transform(v, x -> 0.0)
                          ELSE list_transform(v,
                               x -> floor(x * 127.0 / s + 0.5)) END AS qv
              FROM base
            ), approx AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) *
                               sqrt(list_dot_product(c.qv, c.qv)) = 0
                          THEN -2.0
                          ELSE list_dot_product(q.qv, c.qv) /
                               (sqrt(list_dot_product(q.qv, q.qv)) *
                                sqrt(list_dot_product(c.qv, c.qv))) END AS ac
              FROM q8 q CROSS JOIN q8 c
              WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
            ), cand AS (
              SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY ac DESC,
                                                   neighbor_id ASC) AS rk
                FROM approx) WHERE rk <= 20
            )
            SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r FROM (
              SELECT cand.query_id, cand.neighbor_id,
                     list_cosine_similarity(qe.v, ne.v) AS cosine,
                     row_number() OVER (
                       PARTITION BY cand.query_id
                       ORDER BY list_cosine_similarity(qe.v, ne.v) DESC,
                                cand.neighbor_id ASC) AS rk
              FROM cand
              JOIN base qe ON qe.vec_id = cand.query_id
              JOIN base ne ON ne.vec_id = cand.neighbor_id
            ) WHERE rk <= 5
        """,
        "sim2_embedding_near_dup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                         CAST(b.embedding AS DOUBLE[])), 6) AS cosine_r
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                  CAST(b.embedding AS DOUBLE[])) >= 0.4
        """,
        "mm1_media_features": """
            SELECT doc_id AS media_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   CAST(octet_length(encode(text)) % 10 + 1 AS INTEGER) AS n_frames
            FROM documents
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_quantity > 45)
            GROUP BY o_orderpriority
        """,
        "q13_customer_distribution": """
            SELECT c_count, COUNT(*) AS custdist FROM (
              SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN
                   (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
                   ON c_custkey = o.o_custkey
              GROUP BY c_custkey
            ) GROUP BY c_count
        """,
        "q15_top_supplier": """
            WITH revenue AS (
              SELECT l_suppkey,
                     SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                       AS total_rev
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
            FROM revenue JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
        """,
        "q17_small_quantity_revenue": """
            WITH aq AS (
              SELECT l_partkey AS ap,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(l_quantity) AS avg_qty
              FROM lineitem GROUP BY l_partkey
            )
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     / 7.0 AS avg_yearly,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN aq ON l_partkey = ap
            WHERE p_brand = 'Brand#1' AND l_quantity < 0.5 * avg_qty
        """,
        "q22_global_sales_opportunity": """
            SELECT substring(c_name, 10, 1) AS cntrycode,
                   COUNT(*) AS numcust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     AS totacctbal
            FROM customer
            WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                                      AS DOUBLE) / COUNT(c_acctbal)
                               FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_totalprice > 300000)
            GROUP BY substring(c_name, 10, 1)
        """,
        "q7_volume_shipping": """
            SELECT supp_nation, cust_nation, l_year,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                        AS DOUBLE) AS revenue,
                   COUNT(*) AS n
            FROM (
              SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
                     l_extendedprice, l_discount
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
                AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            )
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "q9_product_profit": """
            SELECT n_name AS nation,
                   CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        - CAST(l_extendedprice AS DECIMAL(18,2)) *
                          CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            WHERE p_type LIKE '%STAND%'
            GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, c_acctbal, revenue, rn FROM (
              SELECT c_custkey, c_name, c_acctbal, revenue,
                     row_number() OVER (ORDER BY revenue DESC, c_custkey ASC)
                       AS rn
              FROM (
                SELECT c_custkey, c_name, c_acctbal,
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                            AS DOUBLE) AS revenue
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate < TIMESTAMP '1997-01-01'
                GROUP BY c_custkey, c_name, c_acctbal
              )
            ) WHERE rn <= 20
        """,
        "fn1_funnel": """
            WITH pv AS (
              SELECT user_id,
                     MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
              FROM events GROUP BY user_id
            ), fc AS (
              SELECT e.user_id, pv.t_view, MIN(e.ts) AS t_click
              FROM events e JOIN pv ON e.user_id = pv.user_id
              WHERE e.event_type = 'click' AND e.ts > pv.t_view
              GROUP BY e.user_id, pv.t_view
            ), fp AS (
              SELECT e.user_id, MIN(e.ts) AS t_purchase
              FROM events e JOIN fc ON e.user_id = fc.user_id
              WHERE e.event_type = 'purchase' AND e.ts > fc.t_click
              GROUP BY e.user_id
            )
            SELECT (SELECT COUNT(*) FROM pv WHERE t_view IS NOT NULL)
                     AS n_viewed,
                   (SELECT COUNT(*) FROM fc) AS n_clicked_after_view,
                   (SELECT COUNT(*) FROM fp) AS n_purchased_after_click
        """,
        "q2_groupwise_max": """
            SELECT c_nationkey, c_custkey, c_name, c_acctbal
            FROM customer c1
            WHERE c_acctbal = (SELECT MAX(c_acctbal) FROM customer c2
                               WHERE c2.c_nationkey = c1.c_nationkey)
        """,
        "aj1_asof_join": """
            SELECT c.event_id, c.user_id,
                   strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, p.purchase_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click') c
            ASOF LEFT JOIN
                 (SELECT user_id, ts, value AS purchase_value FROM events
                  WHERE event_type = 'purchase') p
            ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "rj2_interval_overlap": """
            WITH s AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), g AS (
              SELECT user_id, ts,
                     CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts)
                          AS INTEGER) AS sid
              FROM s
            ), sess AS (
              SELECT user_id, sid, MIN(ts) AS t0, MAX(ts) AS t1
              FROM g GROUP BY user_id, sid
            )
            SELECT a.user_id AS user_a, a.sid AS sid_a,
                   b.user_id AS user_b, b.sid AS sid_b,
                   epoch_us(least(a.t1, b.t1)) - epoch_us(greatest(a.t0, b.t0))
                     AS overlap_us
            FROM sess a JOIN sess b
              ON a.user_id < b.user_id
             AND a.t0 <= b.t1 AND b.t0 <= a.t1
        """,
        "rj1_range_join": """
            SELECT c_custkey, c_acctbal, tier
            FROM customer LEFT JOIN (
              VALUES ('negative', -100000.0, 0.0),
                     ('low', 0.0, 3000.0),
                     ('mid', 3000.0, 7000.0),
                     ('high', 7000.0, 100000.0)) AS bands(tier, lo, hi)
              ON c_acctbal >= lo AND c_acctbal < hi
        """,
        "hh1_heavy_hitters": """
            SELECT event_type, user_id, n, rk FROM (
              SELECT event_type, user_id, n,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY n DESC, user_id ASC) AS rk
              FROM (SELECT event_type, user_id, COUNT(*) AS n
                    FROM events GROUP BY event_type, user_id)
            ) WHERE rk <= 5
        """,
        "mm2_frame_stats": """
            WITH m AS (
              SELECT doc_id AS media_id,
                     octet_length(encode(text)) AS blen,
                     octet_length(encode(text)) % 10 + 1 AS nf
              FROM documents WHERE doc_id % 3 = 2
            )
            SELECT media_id, CAST(fi AS BIGINT) AS frame_idx,
                   CAST(greatest(0, least(16, blen - (fi * 7) % blen))
                        AS BIGINT) AS frame_len
            FROM m, unnest(generate_series(0, nf - 1, 2)) AS t(fi)
        """,
        "st5_stream_join": """
            SELECT l.user_id,
                   strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS l_ts,
                   strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS r_ts,
                   l.value AS l_value, r.value AS r_value
            FROM events l JOIN events r ON l.user_id = r.user_id
             AND r.ts >= l.ts AND r.ts < l.ts + INTERVAL 30 MINUTE
            WHERE l.event_type = 'view' AND r.event_type = 'purchase'
        """,
        "st1_hourly_agg": f"""
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS hour, event_type,
                   COUNT(*) AS n_events,
                   {dsum("value", "sum_value", 6)}
            FROM events GROUP BY date_trunc('hour', ts), event_type
        """,
        "s2_column_pruned_scan": """
            SELECT l_orderkey, l_extendedprice FROM lineitem
            WHERE l_extendedprice > 90000
        """,
        "e4_boolean_ops": """
            SELECT o_orderkey, o_orderpriority,
                   nullif(o_totalprice, 0.0) AS maybe_price
            FROM orders
            WHERE (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')
              AND NOT (nullif(o_totalprice, 0.0) < 200000)
              AND o_orderstatus <> 'P'
        """,
        "sql_dialect": """
            SELECT o_orderpriority AS priority, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'AUTOMOBILE'
            GROUP BY o_orderpriority
        """,
        "udf_normalize": """
            SELECT doc_id,
                   regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
                     AS norm_text,
                   length(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
                     AS norm_len
            FROM documents
        """,
        "json_props": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
            FROM events WHERE event_id < 2000
        """,
        "ck1_constraints": """
            SELECT (SELECT COUNT(*) FROM (
                      SELECT l_orderkey, l_linenumber FROM lineitem
                      GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))
                     AS pk_dup_lineitem,
                   (SELECT COUNT(*) FROM lineitem
                    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
                     AS fk_orphan_lineitem,
                   (SELECT COUNT(*) FROM orders
                    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
                     AS fk_orphan_orders
        """,
        "dml_update_where": """
            SELECT o_orderkey,
                   CASE WHEN o_orderpriority = '1-URGENT'
                        THEN CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) *
                                  CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderpriority
            FROM orders
        """,
        "dml_delete_where": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE NOT (nullif(o_totalprice, 0.0) > 300000)
               OR (nullif(o_totalprice, 0.0) > 300000) IS NULL
        """,
        "q12_shipmode_priority": """
            SELECT l_linestatus,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1994-01-01'
              AND l_shipdate < TIMESTAMP '1996-01-01'
            GROUP BY l_linestatus
        """,
        "q14_promo_effect": """
            SELECT 100.0 *
                   CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN
                        CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                        AS DOUBLE) AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1995-09-01'
              AND l_shipdate < TIMESTAMP '1996-09-01'
        """,
        "q18_large_volume_customer": """
            SELECT c_name, c_custkey, o_orderkey, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_orderkey IN (
              SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        """,
        "q19_disjunctive_pushdown": """
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                        AS DOUBLE) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15)
               OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25)
               OR (p_size > 40 AND l_quantity > 40)
        """,
        "q8_market_share": """
            SELECT o_year, nation_rev, total_rev,
                   nation_rev / total_rev AS mkt_share
            FROM (
              SELECT year(o_orderdate) AS o_year,
                     COALESCE(CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                       END) AS DOUBLE), 0.0) AS nation_rev,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                          AS DOUBLE) AS total_rev
              FROM lineitem
              JOIN part ON l_partkey = p_partkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE p_type = 'ECONOMY'
                AND o_orderdate >= TIMESTAMP '1995-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
                AND r_name = 'ASIA'
              GROUP BY 1
            )
        """,
        "q11_important_stock": """
            WITH filtered AS (
              SELECT l_partkey,
                     CAST(l_extendedprice AS DECIMAL(18,2)) *
                     CAST(l_quantity AS DECIMAL(18,2)) AS value
              FROM lineitem
              WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name IN ('NATION_1', 'NATION_2')
              )
            )
            SELECT l_partkey, CAST(SUM(value) AS DOUBLE) AS part_value
            FROM filtered
            GROUP BY l_partkey
            HAVING CAST(SUM(value) AS DOUBLE) >
                   (SELECT CAST(SUM(value) AS DOUBLE)
                           / COUNT(DISTINCT l_partkey) * 2.0
                    FROM filtered)
        """,
        "q16_supplier_cnt": """
            SELECT p_brand, p_type, p_size,
                   COUNT(DISTINCT l_suppkey) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
            JOIN part ON ps.l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1'
              AND p_type <> 'PROMO'
              AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
              AND ps.l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
            GROUP BY p_brand, p_type, p_size
        """,
        "q20_excess_shipments": """
            WITH bolt_li AS (
              SELECT l_partkey, l_suppkey, l_quantity
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                AND l_shipdate < TIMESTAMP '1996-01-01'
                AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
            ),
            per_pair AS (
              SELECT l_partkey, l_suppkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_ps
              FROM bolt_li GROUP BY l_partkey, l_suppkey
            ),
            per_part AS (
              SELECT l_partkey AS tp,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_total
              FROM bolt_li GROUP BY l_partkey
            )
            SELECT s_suppkey, s_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
              AND s_suppkey IN (
                SELECT l_suppkey FROM per_pair JOIN per_part ON l_partkey = tp
                WHERE qty_ps > 0.3 * qty_total
              )
        """,
        "q21_waiting_supplier": """
            SELECT s_suppkey, s_name, COUNT(*) AS numwait
            FROM lineitem l1
            JOIN supplier ON l1.l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            JOIN orders ON l1.l_orderkey = o_orderkey
            WHERE l1.l_returnflag = 'R'
              AND r_name = 'ASIA'
              AND o_orderstatus = 'F'
              AND EXISTS (
                SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey
              )
              AND NOT EXISTS (
                SELECT 1 FROM lineitem l3
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_returnflag = 'R'
              )
            GROUP BY s_suppkey, s_name
        """,
        "a9_cube": f"""
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                   {dsum("o_totalprice", "sum_price")},
                   CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                        AS BIGINT) AS gid
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "a10_percentiles": """
            SELECT o_orderpriority,
                   quantile_cont(o_totalprice, 0.5) AS p50,
                   quantile_cont(o_totalprice, 0.9) AS p90,
                   MIN(o_totalprice) AS p0,
                   MAX(o_totalprice) AS p100
            FROM orders GROUP BY o_orderpriority
        """,
        "q6_forecast_revenue": """
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                     AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1994-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "dt1_date_interval": """
            SELECT o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                   strftime(o_orderdate + INTERVAL '30 days', '%Y-%m-%d %H:%M:%S.%f') AS due_ts,
                   CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
                   CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
                   CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS d,
                   CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                  DATE '1998-01-01') AS BIGINT) AS days_to_98
            FROM orders WHERE o_orderkey < 3000
        """,
        "e12_cast_types": """
            SELECT p_partkey,
                   CAST(p_size AS DOUBLE) AS size_d,
                   CAST(p_size AS VARCHAR) AS size_s,
                   CAST(p_size AS SMALLINT) AS size_i16,
                   CAST('123' AS INTEGER) AS str_to_int,
                   CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR)
                     AS price_str,
                   CAST(CAST(p_retailprice AS VARCHAR) AS DOUBLE)
                     AS roundtrip_d
            FROM part WHERE p_partkey <= 300
        """,
        "tc1_coercion_ladder": """
            SELECT p_partkey,
                   CAST(p_size + CAST(1 AS TINYINT) AS BIGINT) AS int_plus_tiny,
                   CAST(p_size + CAST(p_partkey AS BIGINT) AS BIGINT)
                     AS int_plus_long,
                   CAST(p_size * p_retailprice AS DOUBLE) AS int_times_double,
                   CAST(-p_size AS BIGINT) AS neg_size,
                   CAST(p_size % 7 AS BIGINT) AS mod7
            FROM part WHERE p_partkey <= 400
        """,
        "w4_rank_distribution": """
            SELECT c_custkey, c_nationkey,
                   percent_rank() OVER w AS pct_rank,
                   cume_dist() OVER w AS cume,
                   CAST(ntile(4) OVER w AS INTEGER) AS quartile
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey
                         ORDER BY c_acctbal ASC, c_custkey ASC)
        """,
        "w3_range_frame": """
            SELECT o_orderkey, o_custkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                        AS DOUBLE) AS spend_90d,
                   CAST(COUNT(*) OVER w AS BIGINT) AS orders_90d
            FROM orders WHERE o_custkey <= 3000
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                         RANGE BETWEEN INTERVAL '90 days' PRECEDING
                               AND CURRENT ROW)
        """,
        "tm1_time_of_day": """
            SELECT event_id,
                   CAST(EXTRACT(HOUR FROM ts) * 3600
                        + EXTRACT(MINUTE FROM ts) * 60
                        + EXTRACT(SECOND FROM ts) AS BIGINT) AS sec_of_day,
                   strftime(ts, '%H:%M:%S') AS time_str
            FROM events WHERE event_id <= 5000
        """,
        "a13_histogram": """
            SELECT bin, CAST(bin * 50000 AS BIGINT) AS lo,
                   COUNT(*) AS n_orders
            FROM (SELECT LEAST(CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT),
                               11) AS bin
                  FROM orders)
            GROUP BY bin
        """,
        "t9_bm25_search": """
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents
            ), toknz AS (
              SELECT doc_id, term FROM tok WHERE term <> ''
            ), dl AS (
              SELECT doc_id, COUNT(*) AS dl FROM toknz GROUP BY doc_id
            ), tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM toknz
              WHERE term IN ('scan', 'join', 'filter')
              GROUP BY doc_id, term
            ), dfreq AS (
              SELECT term, COUNT(*) AS df FROM tf GROUP BY term
            ), gparams AS (
              SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                     (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM dl)
                       AS avgdl
            ), scored AS (
              SELECT doc_id,
                     CAST(SUM(CAST(ROUND(
                       LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                       * tf * (1.2 + 1.0)
                       / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)),
                       6) AS DECIMAL(18,6))) AS DOUBLE) AS score
              FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
                   CROSS JOIN gparams
              GROUP BY doc_id
            )
            SELECT rnk, doc_id, score FROM (
              SELECT doc_id, score,
                     row_number() OVER (ORDER BY score DESC, doc_id ASC)
                       AS rnk
              FROM scored
            ) WHERE rnk <= 10
        """,
        "arr2_array_ops": """
            SELECT vec_id,
                   CAST(len(embedding) AS BIGINT) AS n_dims,
                   ROUND(list_sum(list_transform(
                       CAST(embedding AS DOUBLE[]), x -> abs(x))), 6)
                     AS l1_norm,
                   ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax,
                   ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin,
                   ROUND(list_sum(CAST(embedding[1:4] AS DOUBLE[])), 6)
                     AS head4_sum,
                   CAST(len(list_filter(embedding, x -> x > 0))
                        AS BIGINT) AS n_pos
            FROM embeddings WHERE vec_id < 2000
        """,
        "t10_sequence_pack": """
            WITH toks AS (
              SELECT doc_id, doc_id % 16 AS shard,
                     CAST(len(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS BIGINT)
                       AS n_tokens
              FROM documents
            ), cum AS (
              SELECT doc_id, shard, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING)
                       - n_tokens AS start_tok
              FROM toks
            )
            SELECT doc_id, shard, n_tokens,
                   CAST(FLOOR(start_tok / 2048.0) AS BIGINT) AS pack_id,
                   CAST(start_tok % 2048 AS BIGINT) AS pack_offset
            FROM cum
        """,
        "t8_tfidf_topterms": """
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM tok
              WHERE term <> '' GROUP BY doc_id, term
            ), dfreq AS (
              SELECT term, COUNT(*) AS df FROM tf GROUP BY term
            ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
            scored AS (
              SELECT doc_id, term, tf,
                     ROUND(tf * (LN((1.0 + n_docs) / (1.0 + df)) + 1.0), 6)
                       AS score
              FROM tf JOIN dfreq USING (term) CROSS JOIN n
            )
            SELECT doc_id, rnk, term, tf, score FROM (
              SELECT doc_id, term, tf, score,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, term ASC) AS rnk
              FROM scored
            ) WHERE rnk <= 3
        """,
        "a12_stats_moments": """
            WITH m AS (
              SELECT l_returnflag, COUNT(*) AS n,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                              * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                              * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
              FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_returnflag, n,
                   ROUND(sx / n, 6) AS mean_qty,
                   ROUND(SQRT((sxx - sx * sx / n) / (n - 1.0)), 6) AS std_qty,
                   ROUND((n * sxy - sx * sy)
                         / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)),
                         6) AS corr_qty_price
            FROM m
        """,
        "st2_sessionize": f"""
            WITH marked AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               IS NULL
                          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               >= INTERVAL '30 minutes'
                          THEN 1 ELSE 0 END AS is_new
              FROM events
            ), sessions AS (
              SELECT user_id, ts, value,
                     SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM marked
            )
            SELECT strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                   strftime(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f') AS session_end,
                   user_id, COUNT(*) AS n_events,
                   {dsum("value", "sum_value", 6)}
            FROM sessions GROUP BY user_id, session_id
        """,
        "a9_grouping_sets": f"""
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   {dsum("l_quantity", "sum_qty", 2)},
                   CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
                   CAST(GROUPING(l_linestatus) AS INT) AS g_status
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag), ())
        """,
        "w2_window_lead_movavg": """
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   lead(o_totalprice, 1) OVER w AS next_price,
                   lag(o_totalprice, 2) OVER w AS prev2_price,
                   first_value(o_orderkey) OVER w AS first_key,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) OVER w4
                        AS DOUBLE) / COUNT(*) OVER w4 AS movavg4,
                   CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                   percent_rank() OVER w AS pct_rank,
                   cume_dist() OVER w AS cume
            FROM orders WHERE o_totalprice > 300000
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_orderdate ASC, o_orderkey ASC),
                   w4 AS (PARTITION BY o_orderpriority
                          ORDER BY o_orderdate ASC, o_orderkey ASC
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "pv1_pivot": """
            SELECT o_orderpriority,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2)))
                        FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2)))
                        FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS sum_o,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2)))
                        FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS sum_p
            FROM orders GROUP BY o_orderpriority
        """,
        "ts1_gapfill": """
            WITH bounds AS (
              SELECT date_trunc('hour', MIN(ts)) AS h0,
                     date_trunc('hour', MAX(ts)) AS h1
              FROM events
            ), grid AS (
              SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
              FROM bounds
            ), types AS (
              SELECT DISTINCT event_type FROM events
            ), hourly AS (
              SELECT date_trunc('hour', ts) AS hour, event_type,
                     COUNT(*) AS n_events
              FROM events GROUP BY 1, 2
            )
            SELECT strftime(g.hour, '%Y-%m-%d %H:%M:%S.%f') AS hour,
                   t.event_type,
                   COALESCE(h.n_events, 0) AS n_events
            FROM grid g
            CROSS JOIN types t
            LEFT JOIN hourly h ON h.hour = g.hour AND h.event_type = t.event_type
        """,
        "ts2_locf": """
            SELECT event_id, user_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
                   last_value(CASE WHEN event_type = 'purchase' THEN value END
                              IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS last_purchase_value
            FROM events
        """,
        "st3_sliding_window": f"""
            WITH expanded AS (
              SELECT time_bucket(INTERVAL 15 MINUTES, ts)
                       - s * INTERVAL 15 MINUTES AS window_start,
                     event_type, value
              FROM events, unnest([0, 1, 2, 3]) AS t(s)
            )
            SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S.%f')
                     AS window_start,
                   strftime(window_start + INTERVAL 1 HOUR,
                            '%Y-%m-%d %H:%M:%S.%f') AS window_end,
                   event_type, COUNT(*) AS n_events,
                   {dsum("value", "sum_value", 6)}
            FROM expanded GROUP BY expanded.window_start, event_type
        """,
        "arr1_posexplode": """
            WITH flat AS (
              SELECT vec_id,
                     unnest(range(1, array_length(embedding) + 1)) AS dim,
                     unnest(CAST(embedding AS DOUBLE[])) AS v
              FROM embeddings
            )
            SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
                   round(CAST(SUM(CAST(v AS DECIMAL(38,9))) AS DOUBLE), 6)
                     AS sum_v,
                   MIN(v) AS min_v, MAX(v) AS max_v
            FROM flat GROUP BY dim
        """,
        "lat1_lateral_topn": """
            SELECT c_custkey, t.o_orderkey, t.o_totalprice
            FROM customer JOIN LATERAL (
              SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_custkey = c_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
            ) t ON TRUE
            WHERE c_acctbal > 9000
        """,
        "t7_rolling_fingerprint": """
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_fp,
                   list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(text) + 1),
                         i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
                     (acc, c) -> (acc * 257 + c) % 1000000007) AS fp_poly
            FROM documents
        """,
        "str2_edit_distance": """
            SELECT n_name, r_name,
                   CAST(levenshtein(n_name, r_name) AS BIGINT) AS edit_dist,
                   substr(n_name, 1, 1) = substr(r_name, 1, 1) AS blk
            FROM nation CROSS JOIN region
        """,
        "vnt1_variant_extract": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
                        AS BIGINT) AS sum_k,
                   MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
                   MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
            FROM events GROUP BY event_type
        """,
        "e14_try_functions": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice / NULLIF(l_quantity - l_quantity, 0)
                     AS div_by_zero,
                   TRY_CAST(l_returnflag AS INT) AS flag_as_int,
                   TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE)
                     AS qty_roundtrip
            FROM lineitem WHERE l_orderkey < 2000
        """,
        "set_intersect_all": """
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT ALL
            SELECT s_nationkey FROM supplier
        """,
        "set_except_all": """
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL
            SELECT s_nationkey FROM supplier
        """,
        "pv2_unpivot": """
            WITH wide AS (
              SELECT o_orderpriority,
                     COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                     COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
                     COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
              FROM orders GROUP BY o_orderpriority
            )
            SELECT o_orderpriority, 'n_f' AS status_col, n_f AS n FROM wide
            UNION ALL
            SELECT o_orderpriority, 'n_o', n_o FROM wide
            UNION ALL
            SELECT o_orderpriority, 'n_p', n_p FROM wide
        """,
        "t11_decontaminate": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            dg AS (
              SELECT DISTINCT doc_id, array_to_string(ws[i:i+12], ' ') AS gram
              FROM w, UNNEST(generate_series(1, len(ws) - 12)) AS t(i)
              WHERE len(ws) >= 13
            ),
            bg AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 50 = 0),
            hits AS (
              SELECT doc_id, COUNT(*) AS n
              FROM dg JOIN bg USING (gram) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_contaminated_grams,
                   COALESCE(hits.n, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
        """,
        "t12_repetition_stats": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            tok AS (SELECT doc_id, UNNEST(ws) AS word FROM w),
            wc AS (
              SELECT doc_id, word, COUNT(*) AS c
              FROM tok GROUP BY doc_id, word
            ),
            wstats AS (
              SELECT doc_id, COUNT(*) AS dw, SUM(c) AS nw, MAX(c) AS topc
              FROM wc GROUP BY doc_id
            ),
            bg AS (
              SELECT doc_id, array_to_string(ws[i:i+1], ' ') AS g
              FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
              WHERE len(ws) >= 2
            ),
            bstats AS (
              SELECT doc_id, COUNT(*) AS nb, COUNT(DISTINCT g) AS db
              FROM bg GROUP BY doc_id
            )
            SELECT w.doc_id,
                   round(dw / greatest(nw, 1), 6) AS distinct_word_ratio,
                   round(COALESCE(db, 0) / greatest(COALESCE(nb, 0), 1), 6)
                       AS distinct_bigram_ratio,
                   round(topc / greatest(nw, 1), 6) AS top_word_share
            FROM w
            JOIN wstats ON w.doc_id = wstats.doc_id
            LEFT JOIN bstats ON w.doc_id = bstats.doc_id
        """,
        # t24: comparisons run on the RAW (unrounded) doubles in both
        # engines — the division of identical integers is IEEE-identical,
        # so the keep flag cannot flip at a threshold; round(6) only in
        # the final projection (the repo-wide ratio discipline)
        "t24_gopher_rules": """
            WITH raw AS (
              SELECT doc_id,
                     len(ws) AS n_words,
                     CASE WHEN len(ws) > 0 THEN
                       length(array_to_string(ws, '')) / len(ws) END AS mean_len,
                     CASE WHEN len(ws) > 0 THEN
                       (len(regexp_extract_all(text, '#'))
                        + len(regexp_extract_all(text, '\\.\\.\\.')))
                       / len(ws) END AS sym_ratio,
                     CASE WHEN len(ws) > 0 THEN
                       len(list_filter(ls, l -> l LIKE '- %'
                                            OR l LIKE '* %'
                                            OR l LIKE '•%'))
                       / len(ls) END AS bullet_ratio,
                     CASE WHEN len(ws) > 0 THEN
                       len(list_filter(ls, l -> l LIKE '%...'))
                       / len(ls) END AS ellipsis_ratio,
                     CASE WHEN len(ws) > 0 THEN
                       len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
                       / len(ws) END AS alpha_ratio,
                     CASE WHEN len(ws) > 0 THEN
                       len(list_filter(
                         ['the','be','to','of','and','that','have','with'],
                         s -> list_contains(ws, s))) END AS n_stop
              FROM (
                SELECT doc_id,
                       list_filter(string_split(text, ' '), x -> x <> '')
                         AS ws,
                       string_split(text, chr(10)) AS ls,
                       text
                FROM documents
              )
            )
            SELECT doc_id,
                   CASE WHEN n_words > 0 THEN CAST(n_words AS BIGINT) END
                     AS n_words,
                   round(mean_len, 6) AS mean_word_len,
                   round(sym_ratio, 6) AS symbol_word_ratio,
                   round(bullet_ratio, 6) AS bullet_line_ratio,
                   round(ellipsis_ratio, 6) AS ellipsis_line_ratio,
                   round(alpha_ratio, 6) AS alpha_word_ratio,
                   CAST(n_stop AS BIGINT) AS n_stop_hits,
                   coalesce(
                     n_words >= 30 AND n_words <= 100000
                     AND mean_len >= 3.0 AND mean_len <= 10.0
                     AND sym_ratio <= 0.1
                     AND bullet_ratio <= 0.9
                     AND ellipsis_ratio <= 0.3
                     AND alpha_ratio >= 0.8
                     AND n_stop >= 1, false) AS keep
            FROM raw
        """,
        "ts3_hierarchical_rollup": """
            WITH hourly AS (
              SELECT date_trunc('hour', ts) AS bucket, event_type,
                     COUNT(*) AS n_events,
                     SUM(CAST(value AS DECIMAL(38,6))) AS s
              FROM events GROUP BY 1, 2
            ), daily AS (
              SELECT date_trunc('day', bucket) AS bucket, event_type,
                     SUM(n_events) AS n_events, SUM(s) AS s
              FROM hourly GROUP BY 1, 2
            ), monthly AS (
              SELECT date_trunc('month', bucket) AS bucket, event_type,
                     SUM(n_events) AS n_events, SUM(s) AS s
              FROM daily GROUP BY 1, 2
            )
            SELECT 'hour' AS granularity,
                   strftime(bucket, '%Y-%m-%d %H:%M:%S.%f') AS bucket_start,
                   event_type,
                   CAST(n_events AS BIGINT) AS n_events,
                   CAST(s AS DOUBLE) AS sum_value
            FROM hourly
            UNION ALL
            SELECT 'day', strftime(bucket, '%Y-%m-%d %H:%M:%S.%f'),
                   event_type, CAST(n_events AS BIGINT),
                   CAST(s AS DOUBLE) FROM daily
            UNION ALL
            SELECT 'month', strftime(bucket, '%Y-%m-%d %H:%M:%S.%f'),
                   event_type, CAST(n_events AS BIGINT),
                   CAST(s AS DOUBLE) FROM monthly
        """,
        "st4_quota_admit": """
            SELECT event_id, event_type FROM (
              SELECT event_id, event_type,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY ts ASC, event_id ASC) AS rk
              FROM events
            ) WHERE rk <= 25
        """,
        "cp3_pretraining_ingest": cp3_oracle,
        "cp6_incremental_ingest": cp6_oracle,
        "cp2_curation_pipeline": """
            WITH scored AS (
              SELECT doc_id, text, lang, source,
                     round((least(n_words / 20.0, 1.0)
                            + (1.0 - least(punct_ratio * 5, 1.0))
                            + least(stopword_ratio * 4, 1.0)) / 3.0, 6) AS quality
              FROM (
                SELECT doc_id, text, lang, source,
                       len(string_split(text, ' ')) AS n_words,
                       round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                             AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio,
                       round(CAST(len(list_filter(string_split(text, ' '),
                             w -> lower(w) IN ('the','and','of','to','a','in','is','it','for','on')))
                             AS DOUBLE) / greatest(len(string_split(text, ' ')), 1), 6)
                         AS stopword_ratio
                FROM documents
              )
            ), kept AS (
              SELECT * FROM scored WHERE quality >= 0.4
            ), kw AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM kept
            ), dgk AS (
              SELECT DISTINCT doc_id, array_to_string(ws[i:i+12], ' ') AS gram
              FROM kw, UNNEST(generate_series(1, len(ws) - 12)) AS t(i)
              WHERE len(ws) >= 13
            ), bw AS (
              SELECT string_split(text, ' ') AS ws FROM documents
              WHERE doc_id % 50 = 0
            ), bg AS (
              SELECT DISTINCT array_to_string(ws[i:i+12], ' ') AS gram
              FROM bw, UNNEST(generate_series(1, len(ws) - 12)) AS t(i)
              WHERE len(ws) >= 13
            ), contaminated AS (
              SELECT DISTINCT doc_id FROM dgk JOIN bg USING (gram)
            ), clean AS (
              SELECT k.* FROM kept k
              WHERE k.doc_id NOT IN (SELECT doc_id FROM contaminated)
            ), rep AS (
              SELECT doc_id FROM (
                SELECT doc_id,
                       round(CAST(len(list_distinct(string_split(text, ' ')))
                             AS DOUBLE)
                             / greatest(len(string_split(text, ' ')), 1), 6) AS r
                FROM clean
              ) WHERE r >= 0.2
            ), varied AS (
              SELECT c.* FROM clean c JOIN rep USING (doc_id)
            ), mixed AS (
              SELECT * FROM (
                SELECT v.*,
                       CAST(('0x' || substring(md5(source || '|' ||
                            CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                            AS mix_draw,
                       CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                            ELSE 0.3 END AS mw
                FROM varied v
              ) WHERE mix_draw < mw * 65536
            )
            SELECT doc_id, lang, source, quality,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+'))
                     AS BIGINT) AS n_emails,
                   md5(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+',
                     '<EMAIL>', 'g'),
                     '[0-9][0-9][0-9][-][0-9][0-9][0-9][-][0-9][0-9][0-9][0-9]',
                     '<PHONE>', 'g')) AS scrub_md5
            FROM mixed
        """,
        "t18_temperature_sample": """
            WITH n AS (
              SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
            ), w AS (
              SELECT lang, sqrt(CAST(cnt AS DOUBLE)) AS wt FROM n
            ), q AS (
              SELECT lang,
                     floor(300.0 * wt / (SELECT SUM(wt) FROM w) + 0.5)
                       AS quota
              FROM w
            ), ranked AS (
              SELECT d.doc_id, d.lang,
                     row_number() OVER (
                       PARTITION BY d.lang
                       ORDER BY CAST(('0x' || substring(md5('temp|' ||
                                d.lang || '|' || CAST(d.doc_id AS VARCHAR)),
                                1, 4)) AS BIGINT) ASC,
                                d.doc_id ASC) AS rk
              FROM documents d
            )
            SELECT r.doc_id, r.lang
            FROM ranked r JOIN q ON q.lang = r.lang
            WHERE r.rk <= q.quota
        """,
        "t14_domain_mix": """
            SELECT doc_id, source, lang FROM (
              SELECT doc_id, source, lang,
                     CAST(('0x' || substring(md5(source || '|' ||
                          CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                          AS mix_draw,
                     CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                          WHEN 'src2' THEN 0.25 ELSE 0.1 END AS mix_weight
              FROM documents
            ) WHERE mix_draw < mix_weight * 65536
        """,
        "t13_pii_scrub": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+'))
                     AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(text,
                     '[0-9][0-9][0-9][-][0-9][0-9][0-9][-][0-9][0-9][0-9][0-9]'))
                     AS BIGINT) AS n_phones,
                   md5(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+',
                     '<EMAIL>', 'g'),
                     '[0-9][0-9][0-9][-][0-9][0-9][0-9][-][0-9][0-9][0-9][0-9]',
                     '<PHONE>', 'g')) AS scrub_md5
            FROM documents
        """,
        # d7: shared CTE chain (_d7_ctes: d5's transitive closure + t3's
        # quality) + one window pick — the keeper is ROW_NUMBER()=1
        # per cluster
        "d7_canonical_docs": "WITH RECURSIVE "
        + _d7_ctes()
        + """
            SELECT doc_id, cluster_id, quality,
                   (row_number() OVER (
                      PARTITION BY cluster_id
                      ORDER BY quality DESC, doc_id ASC) = 1) AS kept
            FROM assigned
        """,
        # st8: byte-identical redelivery collapses to one DISTINCT
        "st8_stream_dedup": """
            WITH delivered AS (
              SELECT event_id, ts, event_type, value FROM events
              UNION ALL
              SELECT event_id, ts, event_type, value FROM events
              WHERE event_id % 3 = 0
            )
            SELECT DISTINCT event_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
                   event_type, value
            FROM delivered
        """,
        "bpe1_bpe_merges": _bpe_oracle_sql(5),
        # the hybrid tier must learn the IDENTICAL rule sequence
        "bpe3_bpe_merges_hybrid": _bpe_oracle_sql(5),
        "bpe2_bpe_token_counts": _bpe_oracle_sql(5, tokens=True),
        # cp4: d7's chain + kept + the BPE rounds sourced FROM kept,
        # wrapped in the per-lang budget agg
        "cp4_dedup_token_budget": (
            "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,"
            " CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM (\n"
            + _bpe_oracle_sql(
                5,
                tokens=True,
                source="kept",
                tokens_extra_cols=" lang,",
                prefix_ctes=(
                    "RECURSIVE "
                    + _d7_ctes()
                    + """, kept AS (
              SELECT d.doc_id, d.lang, d.text
              FROM documents d JOIN (
                SELECT doc_id,
                       row_number() OVER (
                         PARTITION BY cluster_id
                         ORDER BY quality DESC, doc_id ASC) AS rk
                FROM assigned
              ) r ON d.doc_id = r.doc_id
              WHERE r.rk = 1
            )"""
                ),
            )
            + "\n) GROUP BY lang"
        ),
        **_hash_defined_oracles(),
    }
    # the remaining snapshot probes share their inline siblings' oracles
    # verbatim (same rationale as sim4s above)
    out["sim6s_quantized_snapshot_topk"] = out["sim6_quantized_topk"]
    out["d6s_snapshot_guard"] = out["d6_cross_dedup"]
    # t19: same decimal-sum discipline as the Spark side — the per-doc
    # Σ k·ln(cnt) is summed in DECIMAL(38,12) so partition order can't
    # move the result; round(6) absorbs libm ln's last ulp
    out["t19_perplexity_score"] = """
            WITH wc AS (
              SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS k FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents WHERE text IS NOT NULL
              ) WHERE w <> '' GROUP BY doc_id, w
            ), vocab AS (
              SELECT w, SUM(k) AS cnt FROM wc GROUP BY w
            ), tot AS (
              SELECT SUM(k) AS total FROM wc
            ), s AS (
              SELECT wc.doc_id, CAST(SUM(wc.k) AS BIGINT) AS n_words,
                     SUM(CAST(CAST(wc.k AS DOUBLE) * ln(CAST(v.cnt AS DOUBLE))
                         AS DECIMAL(38,12))) AS slc
              FROM wc JOIN vocab v USING (w) GROUP BY wc.doc_id
            )
            SELECT d.doc_id, s.n_words,
                   round(ln(CAST((SELECT total FROM tot) AS DOUBLE))
                         - CAST(s.slc AS DOUBLE) / s.n_words, 6) AS xent
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        """
    # cp5 nests t19's chain as a CTE and replays t18's quota/draw SQL
    # over the gated set (quota weights follow POST-gate language counts)
    out["cp5_perplexity_mix"] = f"""
            WITH t19 AS ({out['t19_perplexity_score']}),
            kept AS (
              SELECT d.doc_id, d.lang, t.xent
              FROM documents d JOIN t19 t ON d.doc_id = t.doc_id
              WHERE t.xent <= 3.404
            ), n AS (
              SELECT lang, COUNT(*) AS cnt FROM kept GROUP BY lang
            ), w AS (
              SELECT lang, sqrt(CAST(cnt AS DOUBLE)) AS wt FROM n
            ), q AS (
              SELECT lang,
                     floor(200.0 * wt / (SELECT SUM(wt) FROM w) + 0.5)
                       AS quota
              FROM w
            ), ranked AS (
              SELECT k.doc_id, k.lang, k.xent,
                     row_number() OVER (
                       PARTITION BY k.lang
                       ORDER BY CAST(('0x' || substring(md5('temp|' ||
                                k.lang || '|' || CAST(k.doc_id AS VARCHAR)),
                                1, 4)) AS BIGINT) ASC,
                                k.doc_id ASC) AS rk
              FROM kept k
            )
            SELECT r.doc_id, r.lang, r.xent
            FROM ranked r JOIN q ON q.lang = r.lang
            WHERE r.rk <= q.quota
        """
    # t20: bigram stupid-backoff — wcb/uv/bm/tot MATERIALIZED (each is
    # consumed 2-4 times; DuckDB would otherwise inline and re-explode
    # the corpus per consumer, the bpe1 lesson); same DECIMAL(38,12)
    # per-term sum + round(6) as t19; the train split replays
    # md5_draw16 verbatim (the t5/cp5 '0x'||substring(md5) idiom)
    out["t20_bigram_perplexity"] = """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS arr
              FROM documents WHERE text IS NOT NULL
            ), e AS (
              SELECT doc_id,
                     CASE WHEN i > 1 THEN arr[i - 1] END AS prev,
                     arr[i] AS cur
              FROM toks, unnest(generate_series(1, len(arr))) AS t(i)
              WHERE len(arr) > 0
            ), wcb AS MATERIALIZED (
              SELECT doc_id, prev, cur, CAST(COUNT(*) AS BIGINT) AS m,
                     (CAST(('0x' || substring(md5('lm|' ||
                        CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 2 = 0)
                       AS is_train
              FROM e GROUP BY doc_id, prev, cur
            ), uv AS MATERIALIZED (
              SELECT cur AS w, SUM(m) AS cnt FROM wcb
              WHERE is_train GROUP BY cur
            ), tot AS MATERIALIZED (
              SELECT SUM(cnt) AS total FROM uv
            ), bm AS MATERIALIZED (
              SELECT prev, cur, SUM(m) AS bcnt FROM wcb
              WHERE is_train AND prev IS NOT NULL GROUP BY prev, cur
            ), s AS (
              SELECT w.doc_id,
                     CAST(SUM(w.m) AS BIGINT) AS n_words,
                     CAST(SUM(CASE WHEN uc.cnt IS NULL THEN w.m ELSE 0 END)
                          AS BIGINT) AS n_oov,
                     SUM(CAST(CAST(w.m AS DOUBLE) * (CASE
                        WHEN w.prev IS NULL THEN
                          ln(CAST(coalesce(uc.cnt, 1) AS DOUBLE))
                          - ln(CAST((SELECT total FROM tot) AS DOUBLE))
                        WHEN b.bcnt IS NOT NULL THEN
                          ln(CAST(b.bcnt AS DOUBLE))
                          - ln(CAST(up.cnt AS DOUBLE))
                        ELSE ln(0.4)
                          + ln(CAST(coalesce(uc.cnt, 1) AS DOUBLE))
                          - ln(CAST((SELECT total FROM tot) AS DOUBLE))
                      END) AS DECIMAL(38,12))) AS slc
              FROM wcb w
              LEFT JOIN uv uc ON uc.w = w.cur
              LEFT JOIN uv up ON up.w = w.prev
              LEFT JOIN bm b ON b.prev = w.prev AND b.cur = w.cur
              GROUP BY w.doc_id
            )
            SELECT d.doc_id, s.n_words, s.n_oov,
                   round(-CAST(s.slc AS DOUBLE) / s.n_words, 6) AS xent
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        """
    # t21: trigram stupid-backoff — same discipline as t20 with one more
    # MATERIALIZED model CTE; the bigram chain appears twice (position-2
    # scoring and the trigram's backoff target), spelled identically so
    # both branches stay bit-equal to the Spark side
    out["t21_trigram_perplexity"] = """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS arr
              FROM documents WHERE text IS NOT NULL
            ), e AS (
              SELECT doc_id,
                     CASE WHEN i > 2 THEN arr[i - 2] END AS p2,
                     CASE WHEN i > 1 THEN arr[i - 1] END AS p1,
                     arr[i] AS cur
              FROM toks, unnest(generate_series(1, len(arr))) AS t(i)
              WHERE len(arr) > 0
            ), wcb AS MATERIALIZED (
              SELECT doc_id, p2, p1, cur, CAST(COUNT(*) AS BIGINT) AS m,
                     (CAST(('0x' || substring(md5('lm|' ||
                        CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 2 = 0)
                       AS is_train
              FROM e GROUP BY doc_id, p2, p1, cur
            ), uv AS MATERIALIZED (
              SELECT cur AS w, SUM(m) AS cnt FROM wcb
              WHERE is_train GROUP BY cur
            ), tot AS MATERIALIZED (
              SELECT SUM(cnt) AS total FROM uv
            ), bm AS MATERIALIZED (
              SELECT p1, cur, SUM(m) AS bcnt FROM wcb
              WHERE is_train AND p1 IS NOT NULL GROUP BY p1, cur
            ), tm AS MATERIALIZED (
              SELECT p2, p1, cur, SUM(m) AS tcnt FROM wcb
              WHERE is_train AND p2 IS NOT NULL GROUP BY p2, p1, cur
            ), s AS (
              SELECT w.doc_id,
                     CAST(SUM(w.m) AS BIGINT) AS n_words,
                     CAST(SUM(CASE WHEN uc.cnt IS NULL THEN w.m ELSE 0 END)
                          AS BIGINT) AS n_oov,
                     SUM(CAST(CAST(w.m AS DOUBLE) * (CASE
                        WHEN w.p1 IS NULL THEN
                          ln(CAST(coalesce(uc.cnt, 1) AS DOUBLE))
                          - ln(CAST((SELECT total FROM tot) AS DOUBLE))
                        WHEN w.p2 IS NULL THEN
                          (CASE WHEN b.bcnt IS NOT NULL THEN
                             ln(CAST(b.bcnt AS DOUBLE))
                             - ln(CAST(up.cnt AS DOUBLE))
                           ELSE ln(0.4)
                             + ln(CAST(coalesce(uc.cnt, 1) AS DOUBLE))
                             - ln(CAST((SELECT total FROM tot) AS DOUBLE))
                           END)
                        WHEN t.tcnt IS NOT NULL THEN
                          ln(CAST(t.tcnt AS DOUBLE))
                          - ln(CAST(bc.bcnt AS DOUBLE))
                        ELSE ln(0.4)
                          + (CASE WHEN b.bcnt IS NOT NULL THEN
                               ln(CAST(b.bcnt AS DOUBLE))
                               - ln(CAST(up.cnt AS DOUBLE))
                             ELSE ln(0.4)
                               + ln(CAST(coalesce(uc.cnt, 1) AS DOUBLE))
                               - ln(CAST((SELECT total FROM tot) AS DOUBLE))
                             END)
                      END) AS DECIMAL(38,12))) AS slc
              FROM wcb w
              LEFT JOIN uv uc ON uc.w = w.cur
              LEFT JOIN uv up ON up.w = w.p1
              LEFT JOIN bm b ON b.p1 = w.p1 AND b.cur = w.cur
              LEFT JOIN bm bc ON bc.p1 = w.p2 AND bc.cur = w.p1
              LEFT JOIN tm t ON t.p2 = w.p2 AND t.p1 = w.p1 AND t.cur = w.cur
              GROUP BY w.doc_id
            )
            SELECT d.doc_id, s.n_words, s.n_oov,
                   round(-CAST(s.slc AS DOUBLE) / s.n_words, 6) AS xent
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        """
    # t19s: unigram LM fit on the md5 train half, scored with OOV
    # backoff cnt:=1 (the snapshot parquet roundtrip is lossless, so
    # the oracle refits the same counts inline); same DECIMAL(38,12) +
    # round(6) discipline as t19/t20
    out["t19s_lm_snapshot_score"] = """
            WITH wc AS MATERIALIZED (
              SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS k FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents WHERE text IS NOT NULL
              ) WHERE w <> '' GROUP BY doc_id, w
            ), uv AS MATERIALIZED (
              SELECT w, SUM(k) AS cnt FROM wc
              WHERE CAST(('0x' || substring(md5('lm|' ||
                    CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 2 = 0
              GROUP BY w
            ), tot AS MATERIALIZED (
              SELECT SUM(cnt) AS total FROM uv
            ), s AS (
              SELECT wc.doc_id, CAST(SUM(wc.k) AS BIGINT) AS n_words,
                     CAST(SUM(CASE WHEN u.cnt IS NULL THEN wc.k ELSE 0 END)
                          AS BIGINT) AS n_oov,
                     SUM(CAST(CAST(wc.k AS DOUBLE)
                         * ln(CAST(coalesce(u.cnt, 1) AS DOUBLE))
                         AS DECIMAL(38,12))) AS slc
              FROM wc LEFT JOIN uv u ON u.w = wc.w GROUP BY wc.doc_id
            )
            SELECT d.doc_id, s.n_words, s.n_oov,
                   round(ln(CAST((SELECT total FROM tot) AS DOUBLE))
                         - CAST(s.slc AS DOUBLE) / s.n_words, 6) AS xent
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        """
    # t20s: the snapshot form is value-identical to t20 by construction
    # (the model tables round-trip losslessly and the scoring term is
    # the same chain — the sim4s/sim6s/d6s shared-oracle precedent)
    out["t20s_lm_snapshot_backoff"] = out["t20_bigram_perplexity"]
    # d8: the Bloom filter only routes — the EXACT semantics is the
    # plain NOT EXISTS on the canonical word-set fingerprint, so that
    # is the oracle (false positives die in the verify anti-join);
    # coalesce('') matches Spark's concat_ws on a zero-token text
    out["d8_bloom_guard"] = """
            WITH f AS (
              SELECT doc_id,
                     md5(coalesce(list_aggregate(list_sort(list_distinct(
                         list_filter(string_split(text, ' '), x -> x <> ''))),
                         'string_agg', ' '), '')) AS wordset_md5
              FROM documents WHERE text IS NOT NULL
            )
            SELECT b.doc_id, b.wordset_md5
            FROM f b
            WHERE b.doc_id % 2 = 1
              AND NOT EXISTS (SELECT 1 FROM f r
                              WHERE r.doc_id % 2 = 0
                                AND r.wordset_md5 = b.wordset_md5)
        """
    # t26: DSIR — hashed-ngram bucket counts, add-one-smoothed
    # target/pool distributions, DECIMAL c·λ sums, Gumbel-top-100 on
    # the md5 draw; λ's four ln terms are spelled in the Spark
    # builder's exact left-assoc order so the doubles agree bit-wise
    out["t26_dsir_select"] = """
            WITH toks AS (
              SELECT doc_id, (lang = 'en') AS is_t,
                     list_filter(string_split(text, ' '), x -> x <> '') AS arr
              FROM documents WHERE text IS NOT NULL
            ), g AS (
              SELECT doc_id, is_t, arr[i] AS gram
              FROM toks, unnest(generate_series(1, len(arr))) AS t(i)
              WHERE len(arr) > 0
              UNION ALL
              SELECT doc_id, is_t, arr[i - 1] || ' ' || arr[i] AS gram
              FROM toks, unnest(generate_series(2, len(arr))) AS t(i)
              WHERE len(arr) > 1
            ), c AS MATERIALIZED (
              SELECT doc_id, is_t,
                     CAST(('0x' || substring(md5('dsir|' || gram), 1, 4))
                          AS BIGINT) % 512 AS b,
                     CAST(COUNT(*) AS BIGINT) AS c
              FROM g GROUP BY 1, 2, 3
            ), td AS MATERIALIZED (
              SELECT b, SUM(c) AS t_cnt FROM c WHERE is_t GROUP BY b
            ), rd AS MATERIALIZED (
              SELECT b, SUM(c) AS r_cnt FROM c WHERE NOT is_t GROUP BY b
            ), tt AS (SELECT COALESCE(SUM(t_cnt), 0) AS tot_t FROM td),
               rt AS (SELECT COALESCE(SUM(r_cnt), 0) AS tot_r FROM rd),
               model AS (
              SELECT rd.b,
                     ln(CAST(COALESCE(td.t_cnt, 0) + 1 AS DOUBLE))
                     - ln(CAST((SELECT tot_t FROM tt) + 512 AS DOUBLE))
                     - ln(CAST(rd.r_cnt + 1 AS DOUBLE))
                     + ln(CAST((SELECT tot_r FROM rt) + 512 AS DOUBLE)) AS lam
              FROM rd LEFT JOIN td ON td.b = rd.b
            ), s AS (
              SELECT c.doc_id,
                     CAST(SUM(c.c) AS BIGINT) AS n_grams,
                     SUM(CAST(CAST(c.c AS DOUBLE) * m.lam
                              AS DECIMAL(38,12))) AS slc
              FROM c JOIN model m ON m.b = c.b
              WHERE NOT c.is_t
              GROUP BY c.doc_id
            ), keyed AS (
              SELECT doc_id, n_grams, slc,
                     slc + CAST(-ln(-ln((CAST(CAST(('0x' || substring(
                         md5('dsirg0|' || CAST(doc_id AS VARCHAR)), 1, 4))
                         AS BIGINT) AS DOUBLE) + 0.5) / 65536.0))
                       AS DECIMAL(38,12)) AS key
              FROM s
            )
            SELECT doc_id, n_grams,
                   round(CAST(slc AS DOUBLE), 6) AS logw,
                   round(CAST(key AS DOUBLE), 6) AS dsir_key
            FROM keyed ORDER BY key DESC, doc_id LIMIT 100
        """
    # t25: the merged-shards snapshot is value-identical to a
    # MONOLITHIC fit on the whole parity reference — so that is the
    # oracle: model CTEs from doc_id%2=0, t20's term discipline,
    # scoring (and NULL-surfacing) every doc_id%2=1 row
    out["t25_lm_snapshot_merge"] = """
            WITH rt AS (
              SELECT list_filter(string_split(text, ' '), x -> x <> '')
                       AS arr
              FROM documents
              WHERE text IS NOT NULL AND doc_id % 2 = 0
            ), re AS (
              SELECT CASE WHEN i > 1 THEN arr[i - 1] END AS prev,
                     arr[i] AS cur
              FROM rt, unnest(generate_series(1, len(arr))) AS t(i)
              WHERE len(arr) > 0
            ), uv AS MATERIALIZED (
              SELECT cur AS w, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM re GROUP BY cur
            ), tot AS MATERIALIZED (
              SELECT SUM(cnt) AS total FROM uv
            ), bm AS MATERIALIZED (
              SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS bcnt
              FROM re WHERE prev IS NOT NULL GROUP BY prev, cur
            ), gt AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '')
                       AS arr
              FROM documents
              WHERE text IS NOT NULL AND doc_id % 2 = 1
            ), ge AS (
              SELECT doc_id,
                     CASE WHEN i > 1 THEN arr[i - 1] END AS prev,
                     arr[i] AS cur
              FROM gt, unnest(generate_series(1, len(arr))) AS t(i)
              WHERE len(arr) > 0
            ), gw AS MATERIALIZED (
              SELECT doc_id, prev, cur, CAST(COUNT(*) AS BIGINT) AS m
              FROM ge GROUP BY doc_id, prev, cur
            ), s AS (
              SELECT w.doc_id,
                     CAST(SUM(w.m) AS BIGINT) AS n_words,
                     CAST(SUM(CASE WHEN uc.cnt IS NULL THEN w.m ELSE 0 END)
                          AS BIGINT) AS n_oov,
                     SUM(CAST(CAST(w.m AS DOUBLE) * (CASE
                        WHEN w.prev IS NULL THEN
                          ln(CAST(coalesce(uc.cnt, 1) AS DOUBLE))
                          - ln(CAST((SELECT total FROM tot) AS DOUBLE))
                        WHEN b.bcnt IS NOT NULL THEN
                          ln(CAST(b.bcnt AS DOUBLE))
                          - ln(CAST(up.cnt AS DOUBLE))
                        ELSE ln(0.4)
                          + ln(CAST(coalesce(uc.cnt, 1) AS DOUBLE))
                          - ln(CAST((SELECT total FROM tot) AS DOUBLE))
                      END) AS DECIMAL(38,12))) AS slc
              FROM gw w
              LEFT JOIN uv uc ON uc.w = w.cur
              LEFT JOIN uv up ON up.w = w.prev
              LEFT JOIN bm b ON b.prev = w.prev AND b.cur = w.cur
              GROUP BY w.doc_id
            )
            SELECT d.doc_id, s.n_words, s.n_oov,
                   round(-CAST(s.slc AS DOUBLE) / s.n_words, 6) AS xent
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
            WHERE d.doc_id % 2 = 1
        """
    # t22: 4-gram stupid-backoff — the repeated backoff branches (uni
    # appears 4x, the bigram chain 3x, the trigram chain 2x) are
    # composed ONCE in Python and interpolated, so every occurrence is
    # spelled byte-identically (the bit-equality discipline t21 keeps
    # by hand); wcb/uv/tot/bm/tm/qm MATERIALIZED (multi-consumer CTEs,
    # the bpe1 lesson)
    _uni = (
        "ln(CAST(coalesce(uc.cnt, 1) AS DOUBLE))"
        " - ln(CAST((SELECT total FROM tot) AS DOUBLE))"
    )
    _big = (
        "(CASE WHEN b.bcnt IS NOT NULL THEN"
        " ln(CAST(b.bcnt AS DOUBLE)) - ln(CAST(up.cnt AS DOUBLE))"
        f" ELSE ln(0.4) + {_uni} END)"
    )
    _tri = (
        "(CASE WHEN t.tcnt IS NOT NULL THEN"
        " ln(CAST(t.tcnt AS DOUBLE)) - ln(CAST(bc.bcnt AS DOUBLE))"
        f" ELSE ln(0.4) + {_big} END)"
    )
    out["t22_fourgram_perplexity"] = f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS arr
              FROM documents WHERE text IS NOT NULL
            ), e AS (
              SELECT doc_id,
                     CASE WHEN i > 3 THEN arr[i - 3] END AS p3,
                     CASE WHEN i > 2 THEN arr[i - 2] END AS p2,
                     CASE WHEN i > 1 THEN arr[i - 1] END AS p1,
                     arr[i] AS cur
              FROM toks, unnest(generate_series(1, len(arr))) AS t(i)
              WHERE len(arr) > 0
            ), wcb AS MATERIALIZED (
              SELECT doc_id, p3, p2, p1, cur, CAST(COUNT(*) AS BIGINT) AS m,
                     (CAST(('0x' || substring(md5('lm|' ||
                        CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 2 = 0)
                       AS is_train
              FROM e GROUP BY doc_id, p3, p2, p1, cur
            ), uv AS MATERIALIZED (
              SELECT cur AS w, SUM(m) AS cnt FROM wcb
              WHERE is_train GROUP BY cur
            ), tot AS MATERIALIZED (
              SELECT SUM(cnt) AS total FROM uv
            ), bm AS MATERIALIZED (
              SELECT p1, cur, SUM(m) AS bcnt FROM wcb
              WHERE is_train AND p1 IS NOT NULL GROUP BY p1, cur
            ), tm AS MATERIALIZED (
              SELECT p2, p1, cur, SUM(m) AS tcnt FROM wcb
              WHERE is_train AND p2 IS NOT NULL GROUP BY p2, p1, cur
            ), qm AS MATERIALIZED (
              SELECT p3, p2, p1, cur, SUM(m) AS qcnt FROM wcb
              WHERE is_train AND p3 IS NOT NULL GROUP BY p3, p2, p1, cur
            ), s AS (
              SELECT w.doc_id,
                     CAST(SUM(w.m) AS BIGINT) AS n_words,
                     CAST(SUM(CASE WHEN uc.cnt IS NULL THEN w.m ELSE 0 END)
                          AS BIGINT) AS n_oov,
                     SUM(CAST(CAST(w.m AS DOUBLE) * (CASE
                        WHEN w.p1 IS NULL THEN {_uni}
                        WHEN w.p2 IS NULL THEN {_big}
                        WHEN w.p3 IS NULL THEN {_tri}
                        WHEN q.qcnt IS NOT NULL THEN
                          ln(CAST(q.qcnt AS DOUBLE))
                          - ln(CAST(tc.tcnt AS DOUBLE))
                        ELSE ln(0.4) + {_tri}
                      END) AS DECIMAL(38,12))) AS slc
              FROM wcb w
              LEFT JOIN uv uc ON uc.w = w.cur
              LEFT JOIN uv up ON up.w = w.p1
              LEFT JOIN bm b ON b.p1 = w.p1 AND b.cur = w.cur
              LEFT JOIN bm bc ON bc.p1 = w.p2 AND bc.cur = w.p1
              LEFT JOIN tm t ON t.p2 = w.p2 AND t.p1 = w.p1 AND t.cur = w.cur
              LEFT JOIN tm tc ON tc.p2 = w.p3 AND tc.p1 = w.p2 AND tc.cur = w.p1
              LEFT JOIN qm q ON q.p3 = w.p3 AND q.p2 = w.p2 AND q.p1 = w.p1
                            AND q.cur = w.cur
              GROUP BY w.doc_id
            )
            SELECT d.doc_id, s.n_words, s.n_oov,
                   round(-CAST(s.slc AS DOUBLE) / s.n_words, 6) AS xent
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        """
    # t23: 5-gram stupid-backoff — the production order; one more
    # composed chain level (_quad appears twice: the p4-NULL position
    # branch and the unseen-5-gram backoff), one more model CTE (pm)
    # and two more context joins (qc = 4-gram denominator, f = 5-gram)
    _quad = (
        "(CASE WHEN q.qcnt IS NOT NULL THEN"
        " ln(CAST(q.qcnt AS DOUBLE)) - ln(CAST(tc.tcnt AS DOUBLE))"
        f" ELSE ln(0.4) + {_tri} END)"
    )
    out["t23_fivegram_perplexity"] = f"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS arr
              FROM documents WHERE text IS NOT NULL
            ), e AS (
              SELECT doc_id,
                     CASE WHEN i > 4 THEN arr[i - 4] END AS p4,
                     CASE WHEN i > 3 THEN arr[i - 3] END AS p3,
                     CASE WHEN i > 2 THEN arr[i - 2] END AS p2,
                     CASE WHEN i > 1 THEN arr[i - 1] END AS p1,
                     arr[i] AS cur
              FROM toks, unnest(generate_series(1, len(arr))) AS t(i)
              WHERE len(arr) > 0
            ), wcb AS MATERIALIZED (
              SELECT doc_id, p4, p3, p2, p1, cur,
                     CAST(COUNT(*) AS BIGINT) AS m,
                     (CAST(('0x' || substring(md5('lm|' ||
                        CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 2 = 0)
                       AS is_train
              FROM e GROUP BY doc_id, p4, p3, p2, p1, cur
            ), uv AS MATERIALIZED (
              SELECT cur AS w, SUM(m) AS cnt FROM wcb
              WHERE is_train GROUP BY cur
            ), tot AS MATERIALIZED (
              SELECT SUM(cnt) AS total FROM uv
            ), bm AS MATERIALIZED (
              SELECT p1, cur, SUM(m) AS bcnt FROM wcb
              WHERE is_train AND p1 IS NOT NULL GROUP BY p1, cur
            ), tm AS MATERIALIZED (
              SELECT p2, p1, cur, SUM(m) AS tcnt FROM wcb
              WHERE is_train AND p2 IS NOT NULL GROUP BY p2, p1, cur
            ), qm AS MATERIALIZED (
              SELECT p3, p2, p1, cur, SUM(m) AS qcnt FROM wcb
              WHERE is_train AND p3 IS NOT NULL GROUP BY p3, p2, p1, cur
            ), pm AS MATERIALIZED (
              SELECT p4, p3, p2, p1, cur, SUM(m) AS pcnt FROM wcb
              WHERE is_train AND p4 IS NOT NULL
              GROUP BY p4, p3, p2, p1, cur
            ), s AS (
              SELECT w.doc_id,
                     CAST(SUM(w.m) AS BIGINT) AS n_words,
                     CAST(SUM(CASE WHEN uc.cnt IS NULL THEN w.m ELSE 0 END)
                          AS BIGINT) AS n_oov,
                     SUM(CAST(CAST(w.m AS DOUBLE) * (CASE
                        WHEN w.p1 IS NULL THEN {_uni}
                        WHEN w.p2 IS NULL THEN {_big}
                        WHEN w.p3 IS NULL THEN {_tri}
                        WHEN w.p4 IS NULL THEN {_quad}
                        WHEN f.pcnt IS NOT NULL THEN
                          ln(CAST(f.pcnt AS DOUBLE))
                          - ln(CAST(qc.qcnt AS DOUBLE))
                        ELSE ln(0.4) + {_quad}
                      END) AS DECIMAL(38,12))) AS slc
              FROM wcb w
              LEFT JOIN uv uc ON uc.w = w.cur
              LEFT JOIN uv up ON up.w = w.p1
              LEFT JOIN bm b ON b.p1 = w.p1 AND b.cur = w.cur
              LEFT JOIN bm bc ON bc.p1 = w.p2 AND bc.cur = w.p1
              LEFT JOIN tm t ON t.p2 = w.p2 AND t.p1 = w.p1 AND t.cur = w.cur
              LEFT JOIN tm tc ON tc.p2 = w.p3 AND tc.p1 = w.p2 AND tc.cur = w.p1
              LEFT JOIN qm q ON q.p3 = w.p3 AND q.p2 = w.p2 AND q.p1 = w.p1
                            AND q.cur = w.cur
              LEFT JOIN qm qc ON qc.p3 = w.p4 AND qc.p2 = w.p3
                             AND qc.p1 = w.p2 AND qc.cur = w.p1
              LEFT JOIN pm f ON f.p4 = w.p4 AND f.p3 = w.p3 AND f.p2 = w.p2
                            AND f.p1 = w.p1 AND f.cur = w.cur
              GROUP BY w.doc_id
            )
            SELECT d.doc_id, s.n_words, s.n_oov,
                   round(-CAST(s.slc AS DOUBLE) / s.n_words, 6) AS xent
            FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
        """
    return out


def _hll_oracle(src: str, out_col: str, est_col: str, with_all: bool) -> str:
    """Oracle builder for the dataflow HLL (a15, st6): rebuilds every
    register with the same bitwise pipeline (portable 60-bit md5
    fingerprint → high-12-bit register → 6-step smear + bit_count rank)
    and the same estimator, with the 2^(−rho) sum done in exact DECIMAL
    integers so only the final division/ln touch floating point — see
    functions/sketch.py.  ``src`` must select (grp, h); ``with_all``
    appends the merged-registers 'ALL' row (a15's lossless union).
    Vanilla DuckDB SQL throughout — the driver gate runs it directly."""
    p, m = 12, 4096
    q = 60 - p + 1
    a_lit = repr(0.7213 / (1 + 1.079 / m) * m * m * float(2**q))
    est = f"""
              SELECT grp,
                     CAST(round(CASE WHEN raw <= {2.5 * m!r} AND v0 > 0
                                THEN {float(m)!r} * ln({float(m)!r} / v0)
                                ELSE raw END) AS BIGINT) AS approx_n
              FROM (SELECT grp, {m} - v_ne AS v0,
                           {a_lit} / CAST(s_ne
                             + CAST({m} - v_ne AS DECIMAL(38,0))
                               * CAST({2**q} AS DECIMAL(38,0)) AS DOUBLE)
                             AS raw
                    FROM (SELECT grp,
                                 SUM(CAST((CAST(1 AS BIGINT) << ({q} - rho))
                                     AS DECIMAL(38,0))) AS s_ne,
                                 COUNT(*) AS v_ne
                          FROM __SRC__ GROUP BY grp) t) t2"""
    if with_all:
        tail = f"""regs_all AS (
              SELECT 'ALL' AS grp, reg, MAX(rho) AS rho FROM regs GROUP BY reg
            ), per_grp AS ({est.replace('__SRC__', 'regs')}
            ), merged AS ({est.replace('__SRC__', 'regs_all')})
            SELECT grp AS {out_col}, approx_n AS {est_col} FROM per_grp
            UNION ALL
            SELECT grp AS {out_col}, approx_n AS {est_col} FROM merged"""
    else:
        tail = f"""per_grp AS ({est.replace('__SRC__', 'regs')})
            SELECT grp AS {out_col}, approx_n AS {est_col} FROM per_grp"""
    return f"""
            WITH rr AS (
              SELECT grp,
                     (h >> {60 - p}) & {m - 1} AS reg,
                     h & ((CAST(1 AS BIGINT) << {60 - p}) - 1) AS w
              FROM ({src})
            ), s1 AS (SELECT grp, reg, w | (w >> 1) AS s FROM rr),
            s2 AS (SELECT grp, reg, s | (s >> 2) AS s FROM s1),
            s3 AS (SELECT grp, reg, s | (s >> 4) AS s FROM s2),
            s4 AS (SELECT grp, reg, s | (s >> 8) AS s FROM s3),
            s5 AS (SELECT grp, reg, s | (s >> 16) AS s FROM s4),
            s6 AS (SELECT grp, reg, s | (s >> 32) AS s FROM s5),
            regs AS (
              SELECT grp, reg, MAX({q} - bit_count(s)) AS rho
              FROM s6 GROUP BY grp, reg
            ), {tail}
        """


_A15_HLL_ORACLE = _hll_oracle(
    "SELECT o_orderpriority AS grp,"
    f" {_phash.sql_fp60('CAST(o_custkey AS VARCHAR)')} AS h"
    " FROM orders WHERE o_custkey IS NOT NULL",
    out_col="o_orderpriority",
    est_col="approx_n",
    with_all=True,
)

_ST6_HLL_ORACLE = _hll_oracle(
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS grp,"
    f" {_phash.sql_fp60('CAST(user_id AS VARCHAR)')} AS h"
    " FROM events WHERE user_id IS NOT NULL",
    out_col="hour",
    est_col="approx_users",
    with_all=False,
)


def _hash_defined_oracles() -> dict[str, str]:
    """Oracle SQL for the hash-defined queries (sim3/a15/st6/t15/a14) —
    all vanilla DuckDB since round 5: the builder-chosen hash is the
    engine-portable md5 fingerprint (functions/phash.py), so the
    driver's plain-DuckDB gate replays every value exactly.  Merged into
    :func:`oracle_sql`.

    sim3's SRP hyperplane signs depend only on (plane, dim) — data-free —
    so they are precomputed here with the pure-Python Spark-exact XXH64
    and inlined as literal ±1 lists (the SQL itself contains no UDF);
    the fold order of every dot product matches Spark's ``aggregate``
    left fold bit-for-bit via ``list_reduce``.
    """
    from maple_spark.functions.xxh import spark_xxhash64

    num_planes, dims = 8, 64
    sign_lists = [
        "["
        + ",".join(
            "1.0" if (spark_xxhash64(("i32", p), ("i32", j)) & 1) == 1 else "-1.0"
            for j in range(dims)
        )
        + "]"
        for p in range(num_planes)
    ]
    srp_sig = " + ".join(
        f"(CASE WHEN list_reduce(list_transform(generate_series(1, {dims}),"
        f" j -> v[j] * ({sign_lists[p]})[j]), (a, b) -> a + b) > 0"
        f" THEN {1 << p} ELSE 0 END)"
        for p in range(num_planes)
    )
    probe_list = "[CAST(sig AS BIGINT), " + ", ".join(
        f"xor(CAST(sig AS BIGINT), {1 << p})" for p in range(num_planes)
    ) + "]"
    return {
        "sim3_lsh_topk": f"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), sigs AS (
              SELECT vec_id, v, ({srp_sig}) AS sig FROM e
            ), probes AS (
              SELECT query_id, qvec, unnest({probe_list}) AS probe
              FROM (SELECT vec_id AS query_id, v AS qvec, sig FROM sigs
                    WHERE vec_id < 10)
            ), cand AS (
              SELECT p.query_id, s.vec_id AS neighbor_id,
                     list_cosine_similarity(p.qvec, s.v) AS cosine
              FROM probes p JOIN sigs s ON CAST(s.sig AS BIGINT) = p.probe
              WHERE p.query_id <> s.vec_id
            )
            SELECT query_id, neighbor_id, round(cosine, 6) AS cosine_r FROM (
              SELECT query_id, neighbor_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id ASC)
                       AS rk
              FROM cand) WHERE rk <= 5
        """,
        "a15_hll_dataflow": _A15_HLL_ORACLE,
        "st6_hll_stream": _ST6_HLL_ORACLE,
        "t15_weighted_sample": f"""
            SELECT doc_id, n_chars FROM (
              SELECT doc_id, n_chars,
                     row_number() OVER (
                       ORDER BY ln((({_phash.sql_fp60(
                           "'es0|' || CAST(doc_id AS VARCHAR)")} >> 7) + 0.5)
                                   / 9007199254740992.0)
                                / CAST(n_chars AS DOUBLE) DESC,
                                doc_id ASC) AS rk
              FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
            ) WHERE rk <= 100
        """,
        "a14_countmin_sketch": f"""
            WITH exact AS (
              SELECT o_orderpriority, COUNT(*) AS exact_n
              FROM orders GROUP BY o_orderpriority
            ), cells AS (
              -- counters collapse by key: bucket depends only on the value,
              -- so cell count = sum of exact counts of keys mapping there
              SELECT CAST(i AS INTEGER) AS h,
                     {_phash.sql_fp60(
                         "'cm' || CAST(i AS VARCHAR) || '|' || o_orderpriority"
                     )} % 4096 AS bucket,
                     CAST(SUM(exact_n) AS BIGINT) AS n
              FROM exact, unnest(generate_series(0, 4)) AS g(i)
              GROUP BY 1, 2
            ), est AS (
              SELECT e.o_orderpriority, CAST(MIN(c.n) AS BIGINT) AS cms_estimate
              FROM exact e, unnest(generate_series(0, 4)) AS g(i)
              JOIN cells c
                ON c.h = CAST(g.i AS INTEGER)
               AND c.bucket = {_phash.sql_fp60(
                   "'cm' || CAST(g.i AS VARCHAR) || '|' || e.o_orderpriority"
               )} % 4096
              GROUP BY e.o_orderpriority
            )
            SELECT e.o_orderpriority, e.exact_n, est.cms_estimate
            FROM exact e JOIN est USING (o_orderpriority)
        """,
    }
