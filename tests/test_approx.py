"""Approximate-operator accuracy tests — the documented 100 TB scale paths
(HLL count-distinct, t-digest percentiles, freqItems) validated against
their exact counterparts at test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR


def test_approx_count_distinct_within_rsd(spark):
    from maple_spark.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_percentile_approx_close_to_exact(spark):
    from maple_spark.catalog import load_table

    o = load_table(spark, SF_DIR, "orders")
    row = o.agg(
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_freq_items_contains_true_heavy_hitter(spark):
    df = spark.createDataFrame(
        [("hot",)] * 500 + [(f"t{i}",) for i in range(100)], "k string"
    )
    freq = df.freqItems(["k"], support=0.4).collect()[0][0]
    assert "hot" in freq
