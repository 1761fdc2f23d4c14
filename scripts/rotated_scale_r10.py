"""100x sweep for the round-10 rotated-in entries never measured at
scale: t12 (repetition), t13 (PII scrub), st2 (sessionize), t18
(temperature sampling), sim6 (quantized ANN), and the three snapshot
probes (sim4s/sim6s/d6s — construct-timed: the snapshot BUILD is the
amortized cost the probe exists to exercise, so it sits inside the
clock here; the probe-only amortization numbers live in
ANN_SNAPSHOT_AB_r09 / SNAPSHOT_AMORT_r09).

cp4 is excluded by design at 100x: its registry form replays d7's
exact-Jaccard (quadratic oracle-tier) edges — the same exclusion as
d2; its 100 TB composition is the measured d7-LSH + bpe pieces.

Output: SCALE100_rotated_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from scale100_experiment import (  # noqa: E402
    SRC,
    build,
    measure_construct,
    release_session_state,
    timeit,
)

TARGETS = [
    "t12_repetition_stats",
    "t13_pii_scrub",
    "st2_sessionize",
    "t18_temperature_sample",
    "sim6_quantized_topk",
    "sim4s_ivf_snapshot_topk",
    "sim6s_quantized_snapshot_topk",
    "d6s_snapshot_guard",
]

#: builders that run Spark jobs at construction (snapshot writes, Lloyd
#: collects) — clock covers construction, the new_ops_scale rule
CONSTRUCT_TIMED = {
    "sim4s_ivf_snapshot_topk",
    "sim6s_quantized_snapshot_topk",
    "d6s_snapshot_guard",
}


def main() -> None:
    import __spark_entry__ as entrymod
    from maple_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/maple_sfx100"
    spark = get_spark(app_name="rotated_scale_r10")
    if not os.path.exists(f"{out_dir}/documents.parquet"):
        build(spark, out_dir)
    qs = entrymod.queries()
    qs["s1_scan_filter"](spark, SRC).write.format("noop").mode("overwrite").save()

    results: dict = {"load_avg_1m_start": round(os.getloadavg()[0], 2), "queries": {}}
    for name in TARGETS:
        fn = qs[name]
        release_session_state(spark)
        if name in CONSTRUCT_TIMED:
            fn(spark, SRC)  # warm untimed
            small = measure_construct(spark, fn, SRC, 3)
            big = measure_construct(spark, fn, out_dir, 2)
        else:
            small = timeit(fn(spark, SRC), runs=3)
            big = timeit(fn(spark, out_dir), runs=2)
        results["queries"][name] = {
            "sf01": round(small, 3),
            "x100": round(big, 3),
            "ratio": round(big / small, 2),
        }
        print(
            f"{name:30s} sf0.1 {small:7.3f}s  x100 {big:9.3f}s"
            f"  ratio {big / small:6.2f}",
            file=sys.stderr,
        )
    results["load_avg_1m_end"] = round(os.getloadavg()[0], 2)
    with open("/root/repo/SCALE100_rotated_r10.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
