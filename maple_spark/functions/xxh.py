"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(c1, c2, ...)`` starts from seed 42 and folds each
column through the type-specialized XXH64 one-shot paths (Spark
``sql/catalyst`` ``XXH64.hashInt/hashLong/hashUnsafeBytes``, which agree
with the public reference XXH64 of the value's little-endian / UTF-8
bytes):

    acc = 42
    for v in values: acc = XXH64(bytes(v), seed=acc)

int/short/byte/boolean columns hash as 4-byte ints, long as 8-byte,
string as UTF-8 bytes.  This module reimplements the public XXH64
algorithm (Yann Collet, public-domain reference implementation) so a
DuckDB oracle connection can reproduce Spark-hash-dependent queries
(minhash/simhash/SRP/Count-Min) value-exactly — see
``scripts/selfcheck.py``.

Equality with Spark is pinned by ``tests/test_types.py`` property tests
(random ints/longs/strings, plus chained multi-column calls).
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * P2) & _M, 31) * P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 of ``data`` with ``seed`` (unsigned result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed
        v4 = (seed - P1) & _M
        while i + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            v1, v2 = _round(v1, l1), _round(v2, l2)
            v3, v4 = _round(v3, l3), _round(v4, l4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _unsigned(s: int) -> int:
    return s & _M


def np_xxh64_long(vals, seeds):
    """Vectorized Spark ``xxhash64`` of int64 values (numpy arrays):
    the 8-byte one-shot XXH64 path, seeds unsigned.  Returns uint64."""
    import numpy as np

    u = np.uint64
    with np.errstate(over="ignore"):
        x = vals.astype(np.int64).view(np.uint64)
        h = seeds.astype(np.uint64) + u((P5 + 8) & _M)
        k1 = x * u(P2)
        k1 = ((k1 << u(31)) | (k1 >> u(33))) * u(P1)
        h ^= k1
        h = ((h << u(27)) | (h >> u(37))) * u(P1) + u(P4)
        h ^= h >> u(33)
        h *= u(P2)
        h ^= h >> u(29)
        h *= u(P3)
        h ^= h >> u(32)
    return h


#: seed-42 hash of small IntegerType literals (permutation / band / plane
#: salts) — precomputed so vectorized rehash paths are a table lookup
INT_SALT_TABLE_SIZE = 256


def _int_salt_table():
    import numpy as np

    return np.array(
        [xxh64(struct.pack("<i", i), 42) for i in range(INT_SALT_TABLE_SIZE)],
        dtype=np.uint64,
    )


def register_duckdb_udfs(con) -> None:
    """Register Spark-compatible xxhash64 UDFs on a DuckDB connection.

    Historical note: rounds 1-4 used these to give the hash-defined
    queries (minhash banding, simhash, Count-Min, HLL, weighted
    sampling) exact oracle twins on a UDF-equipped DuckDB.  Since round
    5 those queries hash with the engine-portable md5 fingerprint
    (``functions/phash.py``) and their oracles are vanilla SQL in
    ``oracle_sql()``; these UDFs remain for the xxh parity tests and any
    future operator that wants Spark-exact xxhash64 in DuckDB.

    - ``xxh_s(s)``          = Spark ``xxhash64(string_col)``
    - ``xxh_l(h)``          = Spark ``xxhash64(long_col)`` (HLL registers)
    - ``xxh_is(i, s)``      = Spark ``xxhash64(lit(i), string_col)``
    - ``xxh_il(i, h)``      = Spark ``xxhash64(lit(i), long_col)`` —
      vectorized (arrow) since the minhash oracle calls it
      shingles × permutations times
    - ``xxh_il4(b, h0..h3)``= Spark ``xxhash64(lit(b), h0, h1, h2, h3)``
      (the LSH band-bucket hash)
    """
    import duckdb.typing as dt
    import numpy as np
    import pyarrow as pa

    salts = _int_salt_table()

    def xxh_s(s: str) -> int:
        return spark_xxhash64(s)

    def xxh_is(i: int, s: str) -> int:
        return spark_xxhash64(("i32", i), s)

    def xxh_il(i, h):
        iv = i.to_numpy(zero_copy_only=False)
        hv = h.to_numpy(zero_copy_only=False)
        out = np_xxh64_long(hv, salts[iv]).view(np.int64)
        return pa.array(out, type=pa.int64())

    def xxh_il4(b: int, h0: int, h1: int, h2: int, h3: int) -> int:
        return spark_xxhash64(("i32", b), h0, h1, h2, h3)

    def xxh_l(h: int) -> int:
        return spark_xxhash64(h)

    con.create_function("xxh_s", xxh_s, [dt.VARCHAR], dt.BIGINT)
    con.create_function("xxh_l", xxh_l, [dt.BIGINT], dt.BIGINT)
    con.create_function("xxh_is", xxh_is, [dt.INTEGER, dt.VARCHAR], dt.BIGINT)
    con.create_function(
        "xxh_il", xxh_il, [dt.INTEGER, dt.BIGINT], dt.BIGINT, type="arrow"
    )
    con.create_function(
        "xxh_il4",
        xxh_il4,
        [dt.INTEGER, dt.BIGINT, dt.BIGINT, dt.BIGINT, dt.BIGINT],
        dt.BIGINT,
    )


def spark_xxhash64(*values, seed: int = 42) -> int:
    """Spark-semantics ``xxhash64`` over a mixed argument list.

    Python ``int`` arguments are hashed per their Spark column type,
    which must be tagged by wrapping: plain ints hash as LongType
    (Spark's common case for ids/hashes); pass ``("i32", v)`` for an
    IntegerType literal/column, ``str`` for StringType, ``bytes`` for
    BinaryType.  Returns a SIGNED 64-bit value like the Spark column.
    """
    acc = seed
    for v in values:
        if isinstance(v, tuple) and v[0] == "i32":
            acc = xxh64(struct.pack("<i", v[1]), _unsigned(acc))
        elif isinstance(v, bool):
            acc = xxh64(struct.pack("<i", int(v)), _unsigned(acc))
        elif isinstance(v, int):
            acc = xxh64(struct.pack("<q", v), _unsigned(acc))
        elif isinstance(v, str):
            acc = xxh64(v.encode("utf-8"), _unsigned(acc))
        elif isinstance(v, bytes):
            acc = xxh64(v, _unsigned(acc))
        else:
            raise TypeError(f"unsupported xxhash64 operand: {type(v)}")
        acc = _signed(acc)
    return acc
