"""Skew salting + bucketed co-located join tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import rows
from maple_spark.plans import explain_str


def test_salted_join_matches_plain_join(spark):
    from maple_spark.operators.skew import salted_join

    # heavy hitter: key 1 dominates the left side
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1000), (3, 2000)], "k int, lv int"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "k int, rv string")
    got = rows(salted_join(left, right, "k", n_salts=4).select("k", "lv", "rv"))
    want = rows(left.join(right, on="k").select("k", "lv", "rv"))
    assert got == want and len(got) == 501  # 500 key-1 matches + key-2


def test_salted_join_spreads_hot_key(spark):
    from maple_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, i) for i in range(100)], "k int, lv int")
    right = spark.createDataFrame([(1, "a")], "k int, rv string")
    out = salted_join(left, right, "k", n_salts=4)
    # the physical join key includes the salt → partitioning spreads key 1
    assert "__salt" not in out.columns
    assert out.count() == 100


def test_bucketed_join_has_no_exchange(spark, tmp_warehouse):
    from maple_spark.operators.skew import bucket_tables, bucketed_join
    from maple_spark.catalog import load_table
    from conftest import SF_DIR

    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    bucket_tables(
        spark,
        {"b_orders": o, "b_lineitem": li},
        key="o_orderkey",
        n_buckets=8,
    )
    joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    plan = explain_str(joined)
    # co-located: no shuffle on either side (broadcast would also be
    # exchange-free but we want the bucketed SMJ shape — disable broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey"))
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew handling made visible: one hot key dominating a sort-merge
    join gets its shuffle partition split at runtime (isSkew=true in the
    final plan) — the first line of defense before manual salting."""
    from pyspark.sql import functions as F

    hot = spark.range(0, 200_000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    rest = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("payload")
    )
    left = hot.unionByName(rest)
    right = spark.range(0, 100).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("rv")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = left.join(right, "k")
        joined.collect()  # execute THIS plan so its AQE final plan exists
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isSkew=true" in final_plan or "skew=true" in final_plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
