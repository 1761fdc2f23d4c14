"""d6s guard increment-scaling curve (round 11).

SNAPSHOT_STAGE_r11 separated d6s's build (61.6 s at 100x) from its
guard (105.1 s — but of the registry entry's deliberately-huge
HALF-CORPUS increment), and SNAPSHOT_AMORT_r09 measured 11-13 s for a
5k-doc increment — two different protocols.  This script pins the
missing claim ("the guard scales with the INCREMENT, not the
reference") in ONE session: the reference snapshot is built once
(untimed), then increments of 5k / 25k / 125k / 250k docs are guarded
against it, round-robin interleaved min-of-N so host drift hits every
size alike.

    SPARK_GRAFT_DRIVER_MEM=24g python scripts/increment_curve_r11.py

Output: INCREMENT_CURVE_r11.json {rows: sec} + loads.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from scale100_experiment import build, release_session_state  # noqa: E402

X100 = "/tmp/maple_sfx100"

#: modulus → ~increment size at the 500k-doc corpus (odd residue keeps
#: every increment disjoint from the even-doc reference half)
SLICES = [(100, "5k"), (20, "25k"), (4, "125k"), (2, "250k")]


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from maple_spark.catalog import load_table
    from maple_spark.pipelines import dedup
    from maple_spark.session import get_spark

    spark = get_spark(app_name="increment_curve_r11")
    if not os.path.exists(f"{X100}/embeddings.parquet"):
        build(spark, X100)
    d = load_table(spark, X100, "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    snap = e._snapshot_root(X100, "dedup_ref_curve")
    t0 = time.time()
    dedup.build_reference_snapshot(
        ref, snap, "doc_id", "text", num_perm=64, bands=16, k=8
    )
    build_sec = time.time() - t0

    def guard(mod):
        inc = d.where(F.col("doc_id") % mod == 1)
        dedup.cross_dedup_stream(
            inc, None, "doc_id", "text", num_perm=64, bands=16, k=8,
            jaccard_threshold=0.2, reference_snapshot=snap,
        ).write.format("noop").mode("overwrite").save()

    runs = int(os.environ.get("CURVE_RUNS", "2"))
    for mod, _ in SLICES:  # warm, untimed
        guard(mod)
    best = {label: float("inf") for _, label in SLICES}
    loads = []
    for _ in range(runs):
        for mod, label in SLICES:
            release_session_state(spark)
            t0 = time.time()
            guard(mod)
            best[label] = min(best[label], time.time() - t0)
            loads.append(round(os.getloadavg()[0], 2))
    out = {
        "build_once_sec": round(build_sec, 3),
        "guard_sec_by_increment": {k: round(v, 3) for k, v in best.items()},
        "load_min": min(loads),
        "load_max": max(loads),
    }
    with open("/root/repo/INCREMENT_CURVE_r11.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
