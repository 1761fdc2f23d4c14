"""100x sweep for the round-11 rotated-in entries never measured at
scale: the TPC-H tail slice q10/q12/q14/q19 (q6 was already in the
round-7 SCALE100 sweep; t20 and t19s get their 100x legs from
scripts/r11_stage_and_drift.py's load-bracketed drift/lm legs, which
is the stricter protocol for brand-new operators).

Output: SCALE100_rotated_r11.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from scale100_experiment import (  # noqa: E402
    SRC,
    build,
    release_session_state,
    timeit,
)

TARGETS = [
    "q10_returned_items",
    "q12_shipmode_priority",
    "q14_promo_effect",
    "q19_disjunctive_pushdown",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from maple_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/maple_sfx100"
    spark = get_spark(app_name="rotated_scale_r11")
    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        build(spark, out_dir)
    qs = entrymod.queries()
    qs["s1_scan_filter"](spark, SRC).write.format("noop").mode("overwrite").save()

    results: dict = {"load_avg_1m_start": round(os.getloadavg()[0], 2), "queries": {}}
    for name in TARGETS:
        fn = qs[name]
        release_session_state(spark)
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
    with open("/root/repo/SCALE100_rotated_r11.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
