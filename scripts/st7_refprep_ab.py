"""Interleaved A/B: st7's reference-side prep, two-scan vs fused.

A (r7-shipped): ref_buckets = lsh_band_buckets (scan 1: shingle+md5+
64-min groupBy) and ref_sets = row-local fp_set_expr (scan 2:
interpreted transform-lambda md5 per element).
B (r8): ONE _per_doc_sig(with_set=True) groupBy feeding both
_band_explode and the set projection — one shingle+md5 pass, one
exchange carrying (partial mins + partial set).

Both variants noop-sink the two tables in one action (unionByName on a
normalized shape) so the measurement includes everything the static
side must materialize per reference snapshot.  Interleaved min-of-N in
ONE session per the drift discipline.

Usage: python scripts/st7_refprep_ab.py [sf_dir] [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from maple_spark.pipelines import dedup
from maple_spark.pipelines.dedup import _band_explode, _per_doc_sig


def union_shape(buckets, sets):
    return buckets.unionByName(
        sets.select(
            "ref_id",
            F.lit(-1).alias("band"),
            F.element_at("__rset", 1).alias("bucket"),
        )
    )


def main() -> None:
    from maple_spark.catalog import load_table
    from maple_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="st7_refprep_ab")
    ref = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 2 == 0
    )
    k, num_perm, bands = 8, 64, 16

    a_buckets = dedup.lsh_band_buckets(
        ref, "doc_id", "text", num_perm, bands, k
    ).select(F.col("doc_id").alias("ref_id"), "band", "bucket")
    a_sets = ref.select(
        F.col("doc_id").alias("ref_id"),
        dedup.fp_set_expr("text", k).alias("__rset"),
    )
    per_ref = _per_doc_sig(ref, "doc_id", "text", num_perm, k, with_set=True)
    b_buckets = _band_explode(per_ref, "doc_id", num_perm, bands).select(
        F.col("doc_id").alias("ref_id"), "band", "bucket"
    )
    b_sets = per_ref.select(
        F.col("doc_id").alias("ref_id"), F.col("__set").alias("__rset")
    )

    c_sets = (
        dedup.hashed_shingles(ref, "doc_id", "text", k, alias="__h")
        .groupBy("doc_id")
        .agg(F.collect_set("__h").alias("__rset"))
        .select(F.col("doc_id").alias("ref_id"), "__rset")
    )

    plans = {
        "A_two_scan": union_shape(a_buckets, a_sets),
        "B_fused": union_shape(b_buckets, b_sets),
        "C_two_scan_agg_sets": union_shape(a_buckets, c_sets),
    }
    for df in plans.values():  # warm codegen
        df.write.format("noop").mode("overwrite").save()
    best = {name: float("inf") for name in plans}
    for r in range(rounds):
        for name, df in plans.items():  # interleaved
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[name] = min(best[name], dt)
            print(f"round {r} {name:12s} {dt:8.3f}s", flush=True)
    print({n: round(v, 3) for n, v in best.items()})


if __name__ == "__main__":
    main()
