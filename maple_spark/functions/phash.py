"""Engine-portable hashing: the ONE fingerprint both Spark and vanilla
DuckDB compute bit-identically, plus the derived arithmetic (universal
permutations, polynomial buckets) the hash-defined operators build on.

Why this exists.  The dedup / sketch / sampling operators (d3 MinHash-LSH,
d4 SimHash, a14 Count-Min, a15/st6 HLL, t15 weighted sampling) are
*hash-defined*: their output IS a function of a hash the engine chooses.
``xxhash64`` is Spark-native but vanilla DuckDB cannot compute it, so an
xxhash-based formulation can never have a plain-SQL oracle twin.  The
fingerprint here is chosen so that both engines evaluate it natively:

    Spark   CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB  ((('0x' || substr(md5(s), 1, 15))::UBIGINT)::BIGINT)

md5 of the UTF-8 bytes is identical everywhere; 15 hex digits = 60 bits,
which fits BIGINT with headroom (16 digits could exceed 2^63 and overflow
the signed cast).  Everything downstream is plain +,*,%,>>,& arithmetic
on non-negative 64-bit values with every intermediate < 2^62, so neither
engine overflows (DuckDB raises on BIGINT overflow; Spark wraps — both
are avoided, not relied on).  Parity is pinned bit-for-bit by
tests/test_phash.py across ASCII/Unicode/empty inputs.

Derived constructions:

- ``fp60(col)`` / ``sql_fp60(expr)`` — the 60-bit fingerprint.
- ``fp_nib(col)`` / ``sql_fp_nib(expr)`` — hex digit 16 as an extra
  4-bit value, for constructions that want 64 independent bits (SimHash).
- ``perm_consts(n)`` — deterministic (a_i, b_i) pairs for the universal
  multiply-shift family h_i(x) = (a_i·x + b_i) mod P31 over the reduced
  fingerprint x = fp60 mod P31 (Carter–Wegman).  a_i < 2^31 and
  x < 2^31 keep a_i·x < 2^62.  Constants derive from md5 of a tag
  string — no RNG, no global state, identical in every process.
- ``poly_bucket`` / ``sql_poly_bucket`` — order-sensitive polynomial
  combination of several h_i values into one bucket id mod P31 (LSH
  band buckets), with mod applied at each step so intermediates stay
  < 2^62.

MinHash quality note: every permutation is applied to the SAME reduced
value x = fp60 mod P31, so two *distinct* shingles whose fingerprints
collide mod P31 (p ≈ 2^-31) collide under ALL num_perm permutations at
once — one correlated collision event per shingle pair, not an
independent 2^-31 per permutation.  Still negligible: the event merges
two shingles corpus-wide (recall loss ~2^-31, bounded estimator bias),
and candidate pairs are verified with exact Jaccard downstream anyway
(no false positives can survive).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2^31 - 1, the Mersenne prime used as the universal-hash modulus.
P31 = 2147483647

#: Polynomial-bucket multipliers (odd, < 2^31; classic LCG constants).
#: TWO independent polynomials are combined into one ~62-bit bucket id:
#: a single mod-P31 polynomial gives only 2^31 bucket values, and at
#: n = 10^9 documents random bucket collisions would run ~n²/2^31 ≈
#: 2×10^8 spurious candidate pairs PER BAND — each paying exact-Jaccard
#: verification.  Two independent polys collide together with
#: p ≈ 2^-62, restoring the negligible-collision regime of a 64-bit
#: bucket hash while staying plain overflow-safe arithmetic.
BAND_C = 1664525
BAND_C2 = 22695477


# --------------------------------------------------------------------------
# the fingerprint, Spark side
# --------------------------------------------------------------------------

def fp60(col: Column) -> Column:
    """60-bit non-negative BIGINT fingerprint of a *string* column.
    Callers hashing non-string values must cast to string themselves so
    the text representation (and hence the hash) is explicit."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def fp_nib(col: Column) -> Column:
    """Hex digit 16 of md5 as an INT in [0, 15] — 4 extra bits
    independent of :func:`fp60`'s 60."""
    return F.conv(F.substring(F.md5(col), 16, 1), 16, 10).cast("int")


def _poly(cols: list[Column], mult: int) -> Column:
    """acc = (acc·mult + next) mod P31 over values already < P31; every
    intermediate < 2^62."""
    acc = cols[0]
    for c in cols[1:]:
        acc = (acc * F.lit(mult) + c) % F.lit(P31)
    return acc


def poly_bucket(cols: list[Column]) -> Column:
    """Order-sensitive ~62-bit bucket id of several values already
    reduced mod P31: two independent mod-P31 polynomials (BAND_C,
    BAND_C2) packed as polyA·P31 + polyB — see the constants' comment
    for why one 31-bit polynomial is not enough at corpus scale.
    polyA·P31 < 2^62, so no overflow in either engine."""
    return _poly(cols, BAND_C) * F.lit(P31) + _poly(cols, BAND_C2)


# --------------------------------------------------------------------------
# the fingerprint, DuckDB side (SQL-string builders for oracle twins)
# --------------------------------------------------------------------------

def sql_fp60(expr: str) -> str:
    """DuckDB SQL computing :func:`fp60` of a VARCHAR expression."""
    return f"((('0x' || substr(md5({expr}), 1, 15))::UBIGINT)::BIGINT)"


def sql_fp_nib(expr: str) -> str:
    """DuckDB SQL computing :func:`fp_nib` of a VARCHAR expression."""
    return f"((('0x' || substr(md5({expr}), 16, 1))::UBIGINT)::INTEGER)"


def _sql_poly(exprs: list[str], mult: int) -> str:
    acc = f"CAST({exprs[0]} AS BIGINT)"
    for e in exprs[1:]:
        acc = f"((({acc}) * {mult} + ({e})) % {P31})"
    return acc


def sql_poly_bucket(exprs: list[str]) -> str:
    """DuckDB SQL twin of :func:`poly_bucket`.  Accumulators are cast
    to BIGINT explicitly: DuckDB types bare integer literals INT32 and
    raises on INT32 multiplication overflow, so without the cast a
    literal operand would blow up where a BIGINT column would not."""
    return (
        f"(({_sql_poly(exprs, BAND_C)}) * {P31}"
        f" + ({_sql_poly(exprs, BAND_C2)}))"
    )


# --------------------------------------------------------------------------
# deterministic constants
# --------------------------------------------------------------------------

def _const(tag: str, lo: int, hi: int) -> int:
    """Deterministic pseudo-random integer in [lo, hi) from a tag string
    (md5-derived; no RNG so every process/engine agrees)."""
    return lo + int(hashlib.md5(tag.encode()).hexdigest()[:12], 16) % (hi - lo)


def perm_consts(n: int) -> list[tuple[int, int]]:
    """(a_i, b_i) for n universal permutations: a_i in [1, P31),
    b_i in [0, P31)."""
    return [
        (_const(f"maple-mh-a-{i}", 1, P31), _const(f"maple-mh-b-{i}", 0, P31))
        for i in range(n)
    ]
