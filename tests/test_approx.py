"""Approximate-operator accuracy tests — the documented 100 TB scale paths
(HLL count-distinct, t-digest percentiles, freqItems) validated against
their exact counterparts at test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR, SF_MED, rows


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


def test_hll_sketch_accuracy_and_union_consistency(spark):
    """a11: per-group HLL estimates land within ~3% of exact (lgK=12 →
    ~1.6% RSE), and the union of the group sketches equals sketching the
    whole column directly — the mergeability that lets partial sketches
    roll up across partitions/days without re-scanning raw data."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from maple_spark.catalog import load_table

    got = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in e.a11_hll_sketch(spark, SF_MED).collect()
    }
    o = load_table(spark, SF_MED, "orders")
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["ALL"] = o.select("o_custkey").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.03, (k, est, exact[k])

    # union-of-sketches vs one direct sketch: a direct sketch keeps the
    # HIP estimator, which a union must discard — so the two estimates
    # agree within the sketch's error, not bit-for-bit
    direct = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", 12)).alias("est")
    ).collect()[0]["est"]
    assert abs(got["ALL"] - direct) / direct < 0.02


def test_countmin_sketch_error_bound_and_merge(spark):
    """CMS guarantees: estimate >= exact and <= exact + (e/width)*N; and
    two half-corpus sketches merged cell-wise equal the full-corpus
    sketch estimates (mergeability)."""
    import math

    from pyspark.sql import functions as F

    from maple_spark.catalog import load_table
    from maple_spark.functions.sketch import (
        countmin_estimate,
        countmin_table,
        merge_countmin,
    )

    from conftest import SF_DIR

    o = load_table(spark, SF_DIR, "orders")
    n_total = o.count()
    width = 4096
    sketch = countmin_table(o, "o_orderpriority", width=width)
    exact = {r["o_orderpriority"]: r["count"]
             for r in o.groupBy("o_orderpriority").count().collect()}
    keys = o.select("o_orderpriority").distinct()
    est = {r["o_orderpriority"]: r["cms_estimate"]
           for r in countmin_estimate(sketch, keys, "o_orderpriority", width=width).collect()}
    eps = math.e / width
    for k, n in exact.items():
        assert n <= est[k] <= n + eps * n_total, k

    # mergeability: sketch(halfA) + sketch(halfB) == sketch(all)
    a = countmin_table(o.where(F.col("o_orderkey") % 2 == 0), "o_orderpriority", width=width)
    b = countmin_table(o.where(F.col("o_orderkey") % 2 == 1), "o_orderpriority", width=width)
    merged = merge_countmin(a, b)
    est2 = {r["o_orderpriority"]: r["cms_estimate"]
            for r in countmin_estimate(merged, keys, "o_orderpriority", width=width).collect()}
    assert est2 == est


def test_hll_dataflow_accuracy_and_merge(spark):
    """a15 (HLL as a dataflow): per-group estimates land within ~5% of
    exact (p=12 → ~1.6% RSE, small groups ride the linear-counting
    branch); merging the per-group register tables register-wise equals
    building one sketch over the whole column — bit-identical registers,
    hence identical estimates (lossless union, unlike a11's HIP caveat)."""
    from pyspark.sql import functions as F

    from maple_spark.catalog import load_table
    from maple_spark.functions.sketch import (
        hll_estimate,
        hll_registers,
        merge_hll,
    )

    o = load_table(spark, SF_MED, "orders")
    regs = hll_registers(o, ["o_orderpriority"], "o_custkey", p=12)
    got = {
        r["o_orderpriority"]: r["approx_n"]
        for r in hll_estimate(regs, ["o_orderpriority"], p=12).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])

    # lossless union: merged per-group registers == direct whole-column
    # registers, row for row
    merged = regs.groupBy("reg").agg(F.max("rho").alias("rho"))
    direct = hll_registers(o, [], "o_custkey", p=12)
    assert rows(merged) == rows(direct)
    # and merge_hll over a value split reproduces the same table
    lo = hll_registers(o.where(F.col("o_custkey") % 2 == 0), [], "o_custkey")
    hi = hll_registers(o.where(F.col("o_custkey") % 2 == 1), [], "o_custkey")
    assert rows(merge_hll(lo, hi)) == rows(direct)


def test_hll_register_bitmath_matches_python(spark):
    """The smear+popcount register pipeline (a15) equals a pure-Python
    reference (bit_length on the masked md5 fingerprint) on randomized
    values, including the all-zero-tail max-rank edge."""
    import hashlib
    import random

    from maple_spark.functions.sketch import HLL_BITS, hll_registers

    rnd = random.Random(7)
    vals = [rnd.randint(-(2**63), 2**63 - 1) for _ in range(300)]
    # crafting values whose HASH tail is all-zero is impractical; instead
    # pin the formula on the fingerprint directly below, and here pin the
    # end-to-end operator: one row per value, p=4 so registers collide
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        (r["reg"], r["rho"])
        for r in hll_registers(df, [], "x", p=4).collect()
    }

    p = 4
    regs: dict[int, int] = {}
    for v in vals:
        # the portable fingerprint: first 15 hex digits of md5(str(v))
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        reg = h >> (HLL_BITS - p)
        w = h & ((1 << (HLL_BITS - p)) - 1)
        rho = (HLL_BITS - p + 1) - w.bit_length()  # w == 0 → max rank
        regs[reg] = max(regs.get(reg, 0), rho)
    assert got == set(regs.items())


def test_merge_hll_rejects_grouped_tables_without_group_cols(spark):
    """merge_hll must refuse a grouped register table unless its grouping
    columns are passed — silently maxing registers across groups would
    produce one global sketch where per-group sketches were expected."""
    import pytest as _pytest

    from maple_spark.catalog import load_table
    from maple_spark.functions.sketch import hll_registers, merge_hll

    o = load_table(spark, SF_DIR, "orders")
    grouped = hll_registers(o, ["o_orderpriority"], "o_custkey", p=8)
    with _pytest.raises(ValueError, match="group_cols"):
        merge_hll(grouped, grouped)
    merged = merge_hll(grouped, grouped, group_cols=["o_orderpriority"])
    assert rows(merged) == rows(grouped)   # self-union is idempotent
