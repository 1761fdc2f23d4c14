"""d6s guard increment curve, round 12: id-only banding vs set-carry A/B.

Round 11 measured the guard superlinear at half-corpus increments
(INCREMENT_CURVE_r11: 125k docs 14.7 s -> 250k docs 102 s) and the r11
verdict's mechanism hypothesis was the fingerprint-set payload riding
the x16 band explode through the bucket-join shuffle.  Round 12 ships
the payload-free formulation (dedup._cross_dedup_batch_joins: id-only
band rows, sets attached candidate-bounded) as the batch default; this
script measures BOTH arms interleaved in one session (min-of-N, host
drift hits both alike) so the fix is judged against its control, not
against last round's numbers.

    SPARK_GRAFT_DRIVER_MEM=24g python scripts/increment_curve_r12.py

Output: INCREMENT_CURVE_r12.json {build_once_sec, guard_sec_by_increment
{label: {idonly, carry}}, loads}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from scale100_experiment import build, release_session_state  # noqa: E402

X100 = "/tmp/maple_sfx100"

#: modulus -> ~increment size at the 500k-doc corpus (odd residue keeps
#: every increment disjoint from the even-doc reference half)
SLICES = [(100, "5k"), (20, "25k"), (4, "125k"), (2, "250k")]


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from maple_spark.catalog import load_table
    from maple_spark.pipelines import dedup
    from maple_spark.session import get_spark

    spark = get_spark(app_name="increment_curve_r12")
    if not os.path.exists(f"{X100}/embeddings.parquet"):
        build(spark, X100)
    d = load_table(spark, X100, "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    snap = e._snapshot_root(X100, "dedup_ref_curve12")
    t0 = time.time()
    dedup.build_reference_snapshot(
        ref, snap, "doc_id", "text", num_perm=64, bands=16, k=8
    )
    build_sec = time.time() - t0

    def guard(mod: int, carry: bool) -> None:
        inc = d.where(F.col("doc_id") % mod == 1)
        dedup.cross_dedup_stream(
            inc, None, "doc_id", "text", num_perm=64, bands=16, k=8,
            jaccard_threshold=0.2, reference_snapshot=snap,
            carry_sets=carry,
        ).write.format("noop").mode("overwrite").save()

    arms = [("idonly", False), ("carry", True)]
    runs = int(os.environ.get("CURVE_RUNS", "2"))
    for mod, _ in SLICES[:2]:  # warm, untimed (small slices only)
        for _, carry in arms:
            guard(mod, carry)
    best: dict[str, dict[str, float]] = {
        label: {a: float("inf") for a, _ in arms} for _, label in SLICES
    }
    loads = []
    for _ in range(runs):
        for mod, label in SLICES:
            for arm, carry in arms:
                release_session_state(spark)
                t0 = time.time()
                guard(mod, carry)
                best[label][arm] = min(
                    best[label][arm], time.time() - t0
                )
                loads.append(round(os.getloadavg()[0], 2))
    out = {
        "build_once_sec": round(build_sec, 3),
        "guard_sec_by_increment": {
            lbl: {a: round(v, 3) for a, v in arms_v.items()}
            for lbl, arms_v in best.items()
        },
        "load_min": min(loads),
        "load_max": max(loads),
    }
    with open("/root/repo/INCREMENT_CURVE_r12.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
