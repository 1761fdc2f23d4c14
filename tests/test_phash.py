"""Bit-for-bit parity pins for the engine-portable fingerprint
(maple_spark/functions/phash.py): Spark and vanilla DuckDB must compute
identical values for the fingerprint, the universal permutations, and
the polynomial bucket — this is the foundation the d3/d4/a14/a15/st6/t15
driver oracles stand on."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from maple_spark.functions import phash

CASES = [
    "hello",
    "a",
    "",
    "Ünïcode ☃ test",
    "x" * 200,
    "line\nbreak\ttab",
    "1234567890",
]


def test_fp60_parity_spark_vs_duckdb(spark):
    con = duckdb.connect()
    for s in CASES:
        srow = (
            spark.range(1)
            .select(
                phash.fp60(F.lit(s)).alias("fp"),
                phash.fp_nib(F.lit(s)).alias("nib"),
            )
            .collect()[0]
        )
        orow = con.execute(
            f"SELECT {phash.sql_fp60('?')} AS fp, {phash.sql_fp_nib('?')} AS nib",
            [s, s],
        ).fetchone()
        assert (srow["fp"], srow["nib"]) == orow, repr(s)
        # and both equal the pure-Python definition
        hexd = hashlib.md5(s.encode()).hexdigest()
        assert srow["fp"] == int(hexd[:15], 16)
        assert srow["nib"] == int(hexd[15], 16)


def test_permutation_and_bucket_parity(spark):
    """(a·r + b) % P31 chains and the polynomial bucket agree across
    engines and stay within signed-64 at every step."""
    con = duckdb.connect()
    consts = phash.perm_consts(8)
    for s in CASES[:4]:
        r_expr = phash.fp60(F.lit(s)) % F.lit(phash.P31)
        perms = [
            ((F.lit(a) * r_expr + F.lit(b)) % F.lit(phash.P31)).alias(f"h{i}")
            for i, (a, b) in enumerate(consts)
        ]
        srow = spark.range(1).select(*perms).collect()[0]
        bucket = (
            spark.range(1)
            .select(*perms)
            .select(
                phash.poly_bucket([F.col(f"h{i}") for i in range(4)]).alias("bk")
            )
            .collect()[0]["bk"]
        )
        r_sql = f"({phash.sql_fp60('?')} % {phash.P31})"
        cols = ", ".join(
            f"(({a} * r + {b}) % {phash.P31}) AS h{i}"
            for i, (a, b) in enumerate(consts)
        )
        orow = con.execute(
            f"SELECT {cols} FROM (SELECT {r_sql} AS r)", [s]
        ).fetchone()
        assert tuple(srow) == orow, repr(s)
        obucket = con.execute(
            "SELECT "
            + phash.sql_poly_bucket([str(v) for v in orow[:4]])
        ).fetchone()[0]
        assert bucket == obucket, repr(s)
        # overflow headroom: every intermediate < 2^62
        for h in orow:
            assert 0 <= h < phash.P31


def test_perm_consts_deterministic_and_in_range():
    a1 = phash.perm_consts(64)
    a2 = phash.perm_consts(64)
    assert a1 == a2
    assert len({ab for ab in a1}) == 64
    for a, b in a1:
        assert 1 <= a < phash.P31
        assert 0 <= b < phash.P31
