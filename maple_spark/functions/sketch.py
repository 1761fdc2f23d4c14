"""Mergeable sketches expressed in DataFrame algebra.

The HLL surface comes in two tiers: Spark's DataSketches binding
(`hll_sketch_agg` / `hll_union_agg`, used by a11 — production-grade but
engine-internal bytes, so no SQL oracle) and :func:`hll_registers` /
:func:`hll_estimate` (used by a15) — the same algorithm as a pure
bitwise dataflow whose every register a DuckDB oracle reproduces
exactly.  Count-Min has no PySpark binding, so it
is built here from first principles as a dataflow — which is also the
honest 100 TB story: the sketch IS a (depth × width) counter table, i.e.
a tiny DataFrame, and building it is one explode + one groupBy with
map-side partials.  Partial sketches from different partitions/days
merge by summing counters — the property that makes sketches the answer
to frequency questions over unbounded streams (Cormode & Muthukrishnan,
"An Improved Data Stream Summary: The Count-Min Sketch and its
Applications", J. Algorithms 2005).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cm_bucket(i: int, col: str, width: int):
    """Bucket of value ``col`` under CMS hash function ``i``: the
    engine-portable md5 fingerprint (functions/phash.py) of the salted
    string form, mod width — reproducible in vanilla DuckDB, so the a14
    oracle replays every cell exactly."""
    from maple_spark.functions import phash

    return F.pmod(
        phash.fp60(F.concat(F.lit(f"cm{i}|"), F.col(col).cast("string"))),
        F.lit(width),
    )


def countmin_table(
    df: DataFrame, col: str, depth: int = 5, width: int = 4096
) -> DataFrame:
    """Build the CMS counter table for ``col``: one row per non-empty
    (hash_fn, bucket) cell.  depth hash functions = the portable md5
    fingerprint salted by row index (:func:`_cm_bucket`); width buckets
    per row.  Size ≤ depth × width regardless
    of input cardinality; counters from separate builds merge by
    summing (tested).  NULL values are EXCLUDED (like COUNT(DISTINCT)
    and the HLL build): the md5 fingerprint of NULL is NULL, so an
    unfiltered NULL would pile into a NULL bucket that estimate probes
    can never match — yielding a guarantee-breaking estimate of 0
    instead of an over-estimate."""
    df = df.where(F.col(col).isNotNull())
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("h"),
                _cm_bucket(i, col, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.h").alias("h"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def countmin_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 5, width: int = 4096
) -> DataFrame:
    """Point-frequency estimates for every row of ``keys``:
    estimate(x) = min over hash functions of counter[h, bucket_h(x)].
    Guarantees: estimate ≥ true count always; ≤ true + εN with
    probability 1−δ where ε ≈ e/width, δ ≈ exp(−depth).  The keys side
    explodes to depth probes and joins the (tiny) sketch — broadcast.
    NULL keys are dropped to mirror :func:`countmin_table`'s exclusion
    (a NULL probe could only ever read 0, violating the lower bound)."""
    keys = keys.where(F.col(key_col).isNotNull())
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("h"),
                        _cm_bucket(i, key_col, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.h").alias("h"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), on=["h", "bucket"], how="left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("cms_estimate"))
    )


def merge_countmin(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS counter tables built with the same (depth, width):
    cell-wise counter sum — the mergeability property."""
    return (
        a.unionByName(b)
        .groupBy("h", "bucket")
        .agg(F.sum("n").alias("n"))
    )


#: HLL hash width: the engine-portable md5 fingerprint is 60 bits
#: (functions/phash.py), so registers use the high p of 60 and rho ranges
#: over the remaining 60−p.  48+ rho bits bound the countable
#: cardinality at ~2^48 — far beyond any distinct-count this engine
#: will meet (DataSketches a11 is the tier for beyond that).
HLL_BITS = 60


def hll_reg_rho(col: Column, p: int = 12) -> tuple[Column, Column]:
    """The HLL register math as reusable (reg, rho) column expressions —
    one definition shared by the batch register build
    (:func:`hll_registers`) and the streaming one
    (``streaming/events.hll_registers_stream``), so the two can never
    drift.  ``reg`` = high ``p`` bits of the portable md5 fingerprint of
    the value's string form (engine-portable: a vanilla-DuckDB oracle
    replays every register); ``rho`` = leading-zero count of the
    remaining 60−p bits + 1, via a 6-step bit-smear + ``bit_count``
    (pure codegen, no branch: an all-zero tail smears to 0 and lands on
    the max rank 61−p)."""
    from maple_spark.functions import phash

    h = phash.fp60(col.cast("string"))
    reg = F.shiftright(h, HLL_BITS - p).bitwiseAND(F.lit((1 << p) - 1))
    w = h.bitwiseAND(F.lit((1 << (HLL_BITS - p)) - 1))
    # smear the highest set bit of w downward; popcount of the smear is
    # bit_length(w), so rho = (60-p) - bit_length(w) + 1
    s = w
    for k in (1, 2, 4, 8, 16, 32):
        s = s.bitwiseOR(F.shiftrightunsigned(s, k))
    rho = (F.lit(HLL_BITS - p + 1) - F.bit_count(s)).cast("int")
    return reg, rho


def hll_registers(
    df: DataFrame, group_cols: list[str], col: str, p: int = 12
) -> DataFrame:
    """HyperLogLog register table as a dataflow: one row per non-empty
    (group, register) with the max rank observed (Flajolet et al. 2007,
    "HyperLogLog: the analysis of a near-optimal cardinality estimation
    algorithm").  ``reg`` = high ``p`` bits of the portable md5
    fingerprint (:func:`hll_reg_rho`); ``rho`` = leading-zero count of
    the remaining 60−p bits + 1 (an all-zero tail gives the max rank
    61−p).  The leading-zero count is pure bitwise codegen — 6-step
    smear then ``bit_count`` — and the fingerprint is plain md5, so a
    VANILLA DuckDB oracle reproduces every register exactly (the driver
    gate checks a15/st6 value-exact, no UDF tier).

    Register tables built on different partitions/days/groups merge by
    ``max(rho)`` per register (:func:`merge_hll`) — the same
    mergeability story as Spark's DataSketches binding (a11), but with
    nothing engine-internal: the sketch IS this ≤ 2^p-row DataFrame.
    The build is one map-only pass + one groupBy with map-side partial
    max; NULLs are skipped like COUNT(DISTINCT)."""
    reg, rho = hll_reg_rho(F.col(col), p)
    return (
        df.where(F.col(col).isNotNull())
        .select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str], p: int = 12
) -> DataFrame:
    """Cardinality estimate per group from a register table:
    E = α_m·m²/Σ 2^(−M_j), with linear counting (m·ln(m/V)) in the
    small range E ≤ 2.5m when empty registers remain — the standard
    HLL estimator.

    Determinism across engines: 2^(−rho) terms are summed as the exact
    integers 2^(Q−rho) (Q = 65−p = max rank, so every term is a long)
    in DECIMAL(38,0) — exact and order-independent, unlike a double
    sum — and floating point enters only in the final one-rounding
    division.  Output rounds to a whole count, so the ≤1-ulp libm
    difference in ``ln`` between engines cannot surface."""
    m = 1 << p
    q = HLL_BITS - p + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    # α_m·m²·2^Q as one repr-exact literal: both engines compute A/S
    a_lit = alpha * m * m * float(2**q)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {q} - rho)").cast(
                "decimal(38,0)"
            )
        ).alias("s_ne"),
        F.count(F.lit(1)).alias("v_ne"),
    )
    # empty registers contribute 2^0 = 2^Q/2^Q each, added exactly
    s_all = F.col("s_ne") + (F.lit(m) - F.col("v_ne")).cast(
        "decimal(38,0)"
    ) * F.lit(2**q).cast("decimal(38,0)")
    raw = F.lit(a_lit) / s_all.cast("double")
    v_zero = F.lit(m) - F.col("v_ne")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, 0).cast("bigint").alias("approx_n")
    )


def merge_hll(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge two register tables built with the same ``p``: register-wise
    max — HLL's lossless union.  ``group_cols`` must name the grouping
    columns the tables were built with (:func:`hll_registers`'s
    ``group_cols``): merging grouped tables without them would silently
    union registers ACROSS groups into one global sketch."""
    group_cols = group_cols or []
    extra = (set(a.columns) | set(b.columns)) - {*group_cols, "reg", "rho"}
    if extra:
        raise ValueError(
            f"merge_hll: register table carries grouping columns {sorted(extra)};"
            " pass them via group_cols to merge per group"
        )
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )
