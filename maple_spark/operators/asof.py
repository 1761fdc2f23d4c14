"""As-of (point-in-time) join — a custom operator the reference lacks
(SURVEY.md §2.3 J8: as-of/range/interval joins absent).

For each left row, attach the most recent right row with the same key and
``right.time <= left.time`` — the temporal-join primitive of market-data /
event-attribution systems (kdb's ``aj``, DuckDB's ``ASOF JOIN``, Flink's
temporal join).

Spark-first implementation — the union-and-carry formulation:

1. tag both inputs and union them (schema-aligned, right payload nulled on
   left rows);
2. one shuffle: window partitioned by key, ordered by (time, side-tag);
3. ``last(payload, ignorenulls=True)`` carries the latest right payload
   forward onto each left row;
4. filter back to left rows.

Cost at 100 TB: exactly one hash-partition shuffle of (left + right) and a
per-key sort — the same shape as a sort-merge join, with no range
explosion (a naive ``left.t >= right.t`` join is a triangle join that
blows up quadratically per key).  Skewed keys: AQE splits; ties broken by
ordering the right side before the left at equal timestamps (right row at
exactly left.time matches, per ASOF convention).

There is also ``range_join`` for static banding (value BETWEEN lo AND hi
against a small bands table — broadcast nested loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with the same
    ``key`` and ``right_time <= left_time`` (NULLs if none).

    ``payload_cols``: right columns to attach (default: all except key and
    time).  ``tolerance``: optional max staleness (e.g. "30 minutes") —
    right rows older than ``left_time - tolerance`` do not match, which
    also bounds carried state on unbounded/streaming-shaped data.
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (key, right_time)
    ]

    # The whole right row (time + payload) travels as ONE struct and is
    # carried atomically: per-column last(ignorenulls=True) would fill a
    # NULL in the latest right row's payload with a STALE value from an
    # older right row — a chimera of several rows, not ASOF semantics.
    # The struct is non-null exactly when it came from a right row, so
    # last(struct, ignorenulls=True) picks the latest right ROW whole.
    prow = F.struct(
        F.col(right_time).alias("__rt"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(prow.alias("__prow")).schema["__prow"].dataType
        ).alias("__prow"),
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lt.schema["__lrow"].dataType).alias("__lrow"),
        prow.alias("__prow"),
    )
    # right rows sort before left rows at equal (key, time): a right row at
    # exactly left_time is visible to that left row (ASOF convention)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = lt.unionByName(rt).select(
        "*", F.last("__prow", ignorenulls=True).over(w).alias("__c")
    )
    out = carried.where(F.col("__is_left") == 1)
    if tolerance is not None:
        fresh = F.col("__c.__rt") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        picked = [
            F.when(fresh, F.col(f"__c.{c}")).alias(c) for c in payload_cols
        ]
    else:
        picked = [F.col(f"__c.{c}").alias(c) for c in payload_cols]
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns], *picked
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    extra_cond: Column | None = None,
    bin_width_sec: int = 3600,
) -> DataFrame:
    """Interval×interval overlap join: every (left, right) pair whose
    time ranges intersect (``l_start ≤ r_end AND r_start ≤ l_end``,
    closed intervals) — the log-span/session-concurrency primitive.

    The naive formulation is a theta join (BroadcastNestedLoop at best,
    CartesianProduct at worst — quadratic).  The scale path bins: each
    interval explodes to the ``bin_width_sec`` buckets it covers, the
    join becomes an EQUI-join on bucket (+ the exact overlap predicate,
    so binning only generates candidates — never false positives), and
    a pair that shares k buckets is kept only in the FIRST shared bucket
    — the bin of the later start, which both intervals provably cover
    whenever they overlap.  That filter dedups exactly while preserving
    bag semantics (duplicate input rows pair with the theta join's
    multiplicity — a ``distinct`` would collapse them) and costs no
    extra shuffle.

    Cost: replication factor = interval_length/bin_width + 1 per row
    (pick bin_width ≈ typical interval length); one hash shuffle on
    bucket; per-bucket work bounded by bucket population (time-skewed
    data → AQE skew split).  No CartesianProduct (plan-shape-tested).
    Both inputs must carry disjoint column names; timestamps compare as
    epoch seconds."""
    def first_bin(t0: str) -> Column:
        return F.floor(F.col(t0).cast("long") / bin_width_sec)

    def bins(t0: str, t1: str) -> Column:
        return F.explode(
            F.sequence(first_bin(t0), F.floor(F.col(t1).cast("long") / bin_width_sec))
        )

    lb = left.withColumn("__bin", bins(l_start, l_end))
    rb = right.withColumn("__bin", bins(r_start, r_end))
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    # emit each pair exactly once: in the bin of max(l_start, r_start)
    once = F.col("__bin") == F.greatest(first_bin(l_start), first_bin(r_start))
    cond = overlap & once if extra_cond is None else (overlap & once & extra_cond)
    return lb.join(rb, on="__bin").where(cond).drop("__bin")


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Band/range join: fact rows matched to the band whose
    [lo, hi) interval contains ``value_col``.  ``bands`` must be small
    (broadcast): the plan is a BroadcastNestedLoopJoin, which is the right
    physical choice for non-equi conditions against a small build side.
    For large band tables, bucketize the value instead (equi-join on
    floor(value/width))."""
    cond = (fact[value_col] >= bands[lo_col]) & (fact[value_col] < bands[hi_col])
    return fact.join(F.broadcast(bands), on=cond, how="left")
