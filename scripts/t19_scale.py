"""100x scale check for t19 (unigram-LM perplexity scoring), round 10.

Construct-timed (the (doc, word) count table localCheckpoints eagerly at
build — that is the corpus-proportional pass, so it must sit inside the
clock, the same rule as bpe1/d7 in new_ops_scale).  Output:
T19_SCALE_r10.json {sf01, x100, ratio} + load brackets.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from scale100_experiment import SRC, build, measure_construct  # noqa: E402


def main() -> None:
    import __spark_entry__ as entrymod
    from maple_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/maple_sfx100"
    spark = get_spark(app_name="t19_scale")
    if not os.path.exists(f"{out_dir}/documents.parquet"):
        build(spark, out_dir)
    fn = entrymod.queries()["t19_perplexity_score"]

    results = {"load_avg_1m_start": round(os.getloadavg()[0], 2)}
    measure_construct(spark, fn, SRC, 1)  # warm codegen, untimed
    small = measure_construct(spark, fn, SRC, 3)
    big = measure_construct(spark, fn, out_dir, 2)
    results["t19_perplexity_score"] = {
        "sf01": round(small, 3),
        "x100": round(big, 3),
        "ratio": round(big / small, 2),
    }
    results["load_avg_1m_end"] = round(os.getloadavg()[0], 2)
    with open("/root/repo/T19_SCALE_r10.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
