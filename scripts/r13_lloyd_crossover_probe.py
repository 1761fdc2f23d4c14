"""Crossover probe for the Lloyd-assignment tier router (round 13):
times the quantizer's STATS-PASS shape (assign → posexplode → decimal
agg, the dominant per-iteration job in _lloyd_cells) with the Arrow
kernel vs the Catalyst struct-sort at four corpus sizes — the sf0.1
fixture (2k vectors), ~10%/~30% slices of the 100× corpus (20k/60k),
and the full 100× corpus (200k).  The measured tie region (~5-16 MB)
sets similarity.LLOYD_KERNEL_MIN_BYTES (16 MiB).

Also times the bare assignment (noop, no stats agg) at 100× — the
isolated Python-boundary-vs-interpreted-fold comparison.

Usage: python scripts/r13_lloyd_crossover_probe.py
Writes LLOYD_CROSSOVER_r13.json.  Needs /tmp/maple_sfx100 (built by
scripts/scale100_experiment.py on first use).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X100 = "/tmp/maple_sfx100"


def main() -> None:
    from pyspark.sql import functions as F

    from maple_spark.pipelines.similarity import (
        _assign_cells_arrow_udf,
        _dist_structs,
    )
    from maple_spark.pipelines.util import spread
    from maple_spark.session import get_spark, release_session_state
    from scale100_experiment import build

    spark = get_spark(app_name="r13_lloyd_crossover_probe")
    if not os.path.exists(f"{X100}/embeddings.parquet"):
        build(spark, X100)
    # deterministic ~10% / ~30% slices of the 100x corpus
    x = spark.read.parquet(f"{X100}/embeddings.parquet")
    slices = []
    for frac, name in ((10, "emb10"), (30, "emb30")):
        p = f"/tmp/r13_probe_{name}.parquet"
        if not os.path.exists(p):
            x.where(F.pmod(F.xxhash64("vec_id"), F.lit(100)) < frac).write.mode(
                "overwrite"
            ).parquet(p)
        slices.append(p)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def stats(assigned):
        return (
            assigned.select(
                "cell", F.posexplode(F.col("embedding").cast("array<double>"))
            )
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.col("col").cast("decimal(38,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    rec = {"points": [], "loads_1m": []}
    sources = [
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        + "/embeddings.parquet",
        *slices,
        f"{X100}/embeddings.parquet",
    ]
    for src in sources:
        e = spark.read.parquet(src)
        nrows = e.count()
        nbytes = (
            sum(os.path.getsize(f) for f in glob.glob(src + "/*.parquet"))
            if os.path.isdir(src)
            else os.path.getsize(src)
        )
        c = spread(e.select(F.col("vec_id").alias("neighbor_id"), "embedding"))
        cents = [
            [float(v) for v in r["embedding"]]
            for r in c.orderBy("neighbor_id").limit(8).collect()
        ]

        def kern():
            return c.withColumn(
                "cell", _assign_cells_arrow_udf(cents)(F.col("embedding"))
            )

        def expr():
            return c.withColumn(
                "cell",
                F.element_at(
                    F.array_sort(_dist_structs("embedding", cents)), 1
                )["cell"],
            )

        point = {"src": src, "rows": nrows, "bytes": nbytes}
        arms = {"stats_kernel": lambda: stats(kern()),
                "stats_expr": lambda: stats(expr())}
        if src.startswith(X100):
            arms.update({"assign_kernel": kern, "assign_expr": expr})
        for label, mk in arms.items():
            best = float("inf")
            for _ in range(3):
                rec["loads_1m"].append(round(os.getloadavg()[0], 2))
                t0 = time.time()
                noop(mk())
                best = min(best, time.time() - t0)
            point[label] = round(best, 3)
            release_session_state(spark)
        rec["points"].append(point)
        print(json.dumps(point))

    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "LLOYD_CROSSOVER_r13.json",
        ),
        "w",
    ) as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
