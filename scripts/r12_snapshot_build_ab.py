"""Interleaved 100x A/B: single-scan reference-snapshot build (round-12
optimization) vs the previous two-pass formulation.

The round-12 build writes fp_sets from the one shingle+md5 corpus pass
and derives the bucket table from the persisted sets; the pre-r12 build
shingled and hashed the corpus twice (once per table).  Arms alternate
within one session (the load-bracketing discipline); min-of-N per arm.

Usage: python scripts/r12_snapshot_build_ab.py [reps]
Writes SNAPSHOT_BUILD_AB_r12.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale100_experiment import build  # noqa: E402

X100 = "/tmp/maple_sfx100"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    import __spark_entry__ as e  # noqa: F401
    from maple_spark.catalog import load_table
    from maple_spark.pipelines import dedup
    from maple_spark.session import get_spark, release_session_state

    spark = get_spark(app_name="r12_snapshot_build_ab")
    if not os.path.exists(f"{X100}/documents.parquet"):
        build(spark, X100)
    d = load_table(spark, X100, "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    snap = "/tmp/maple_snap_ab_r12"

    def build_old(path: str) -> None:
        # the pre-r12 formulation, verbatim: band from TEXT (pass 1),
        # fp sets from TEXT again (pass 2), then meta
        dedup.lsh_band_buckets(ref, "doc_id", "text", 64, 16, 8).select(
            F.col("doc_id").alias("ref_id"), "band", "bucket"
        ).write.mode("overwrite").parquet(f"{path}/buckets.parquet")
        ref.select(
            F.col("doc_id").alias("ref_id"),
            dedup.fp_set_best("text", 8).alias("__rset"),
        ).write.mode("overwrite").parquet(f"{path}/fp_sets.parquet")
        spark.createDataFrame(
            [(64, 16, 8)], "num_perm int, bands int, k int"
        ).write.mode("overwrite").parquet(f"{path}/meta.parquet")

    def build_new(path: str) -> None:
        dedup.build_reference_snapshot(ref, path, "doc_id", "text")

    out = {"old_two_pass": [], "new_single_scan": []}
    loads = []
    for rep in range(reps):
        for label, fn in (
            ("old_two_pass", build_old), ("new_single_scan", build_new)
        ):
            loads.append(round(os.getloadavg()[0], 2))
            t0 = time.time()
            fn(f"{snap}/{label}")
            out[label].append(round(time.time() - t0, 2))
            release_session_state(spark)
    rec = {
        "corpus": "100x sf0.1 documents (even half as reference)",
        "reps": reps,
        "legs": out,
        "min": {k: min(v) for k, v in out.items()},
        "loads_1m": loads,
    }
    print(json.dumps(rec))
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SNAPSHOT_BUILD_AB_r12.json"), "w"
    ) as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
