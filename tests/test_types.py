"""Type-system mapping tests (SURVEY.md §1.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import rows


def test_sql_type_map_complete(spark):
    from maple_spark.types import SQL_TYPE_MAP

    # every declared reference type (SQLDataType.java) is mapped
    for t in [
        "INTEGER", "SMALLINT", "BIGINT", "TINYINT", "FLOAT", "DOUBLE",
        "CHAR", "VARCHAR", "TEXT", "BLOB", "DATE", "TIME", "DATETIME",
        "TIMESTAMP", "INTERVAL",
    ]:
        assert t in SQL_TYPE_MAP


def test_char_field_metadata_and_bounds():
    from maple_spark.types import char_field

    f = char_field("name", 30)
    assert f.metadata == {"sql_type": "VARCHAR", "length": 30}
    with pytest.raises(ValueError):
        char_field("bad", 0)
    with pytest.raises(ValueError):
        char_field("bad", 70000)


def test_length_violations(spark):
    from maple_spark.types import length_violations

    df = spark.createDataFrame([("ok",), ("toolongvalue",)], "s string")
    assert rows(length_violations(df, "s", 5)) == [("toolongvalue",)]


def test_time_seconds_roundtrip(spark):
    from maple_spark.types import seconds_to_time_str, time_to_seconds

    df = spark.createDataFrame([(13, 45, 30)], "h int, m int, s int")
    out = df.select(
        time_to_seconds(F.col("h"), F.col("m"), F.col("s")).alias("sec")
    ).select("sec", seconds_to_time_str(F.col("sec")).alias("t"))
    got = out.collect()[0]
    assert got["sec"] == 13 * 3600 + 45 * 60 + 30
    assert got["t"] == "13:45:30"


def test_numeric_precision_scale(spark):
    from maple_spark.types import numeric

    t = numeric(12, 2)
    df = spark.createDataFrame([(1.555,)], "v double").select(
        F.col("v").cast(t).alias("d")
    )
    assert str(df.schema["d"].dataType) == "DecimalType(12,2)"


def test_coercion_ladder_matches_spark(spark):
    """Arithmetic coercion: int+long→long, anything+double→double.
    Note: the reference ladder (TypeConverter.java:430-458) would give
    long+float→FLOAT; Spark widens long+float→DOUBLE to avoid precision
    loss (a long doesn't fit in a float) — the safer semantics, kept."""
    df = spark.createDataFrame([(1, 2, 3.0, 4.0)], "i int, l long, f float, d double")
    types = dict(
        df.select(
            (F.col("i") + F.col("l")).alias("il"),
            (F.col("l") + F.col("f")).alias("lf"),
            (F.col("f") + F.col("d")).alias("fd"),
        ).dtypes
    )
    assert types == {"il": "bigint", "lf": "double", "fd": "double"}


def test_python_xxh64_matches_spark(spark):
    """The pure-Python XXH64 (extended-oracle hash) equals Spark's
    xxhash64 on every type path it claims: i32, i64, UTF-8 strings, and
    chained multi-column calls — randomized inputs, fixed seed."""
    import random

    from maple_spark.functions.xxh import spark_xxhash64

    rnd = random.Random(99)
    data = [
        (
            rnd.randint(-(2**63), 2**63 - 1),
            rnd.randint(-(2**31), 2**31 - 1),
            "".join(
                chr(rnd.choice([rnd.randint(32, 126), rnd.randint(0x3B1, 0x3C9)]))
                for _ in range(rnd.randint(0, 40))
            ),
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame(data, "l long, i int, s string")
    got = df.select(
        "l", "i", "s",
        F.xxhash64("l").alias("hl"),
        F.xxhash64("i").alias("hi"),
        F.xxhash64("s").alias("hs"),
        F.xxhash64("i", "s", "l").alias("hc"),
    ).collect()
    for r in got:
        assert r.hl == spark_xxhash64(r.l)
        assert r.hi == spark_xxhash64(("i32", r.i))
        assert r.hs == spark_xxhash64(r.s)
        assert r.hc == spark_xxhash64(("i32", r.i), r.s, r.l)


def test_np_xxh64_long_matches_scalar():
    """The vectorized rehash path (minhash oracle) equals the scalar
    implementation for random (salt, value) pairs."""
    import numpy as np

    from maple_spark.functions.xxh import (
        _int_salt_table,
        np_xxh64_long,
        spark_xxhash64,
    )

    rng = np.random.default_rng(4)
    vals = rng.integers(-(2**63), 2**63, 500, dtype=np.int64)
    perms = rng.integers(0, 64, 500, dtype=np.int32)
    got = np_xxh64_long(vals, _int_salt_table()[perms]).view(np.int64)
    for g, p, v in zip(got, perms, vals):
        assert g == spark_xxhash64(("i32", int(p)), int(v))
