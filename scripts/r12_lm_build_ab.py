"""Interleaved 100x A/B: thread-pooled LM snapshot build (round-12
optimization: parallel model-table writes + meta derived from the
checkpointed counts) vs the pre-r12 sequential formulation.

Usage: python scripts/r12_lm_build_ab.py [order] [reps]
Writes LM_BUILD_AB_r12.json.
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
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from pyspark.sql import functions as F

    from maple_spark.catalog import load_table
    from maple_spark.pipelines import textstats
    from maple_spark.pipelines.textstats import LM_CTX, lm_positions
    from maple_spark.session import get_spark, release_session_state

    spark = get_spark(app_name="r12_lm_build_ab")
    if not os.path.exists(f"{X100}/documents.parquet"):
        build(spark, X100)
    d = load_table(spark, X100, "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    snap = "/tmp/maple_lm_ab_r12"

    def build_old(path: str) -> None:
        # the pre-r12 formulation: sequential writes, meta read back
        # from the persisted vocab
        names = [n for n, _ in LM_CTX[order]]
        g = (
            lm_positions(ref, LM_CTX[order], None, "text")
            .groupBy(*names, "cur")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=True)
        )
        wc = g.groupBy(F.col("cur").alias("w")).agg(F.sum("cnt").alias("cnt"))
        p1 = "prev" if order == 2 else "p1"
        g.where(F.col(p1).isNotNull()).groupBy(
            F.col(p1).alias("prev"), F.col("cur")
        ).agg(F.sum("cnt").alias("bcnt")).write.mode("overwrite").parquet(
            f"{path}/bigram.parquet"
        )
        wc.write.mode("overwrite").parquet(f"{path}/vocab.parquet")
        spark.read.parquet(f"{path}/vocab.parquet").agg(
            F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_vocab")
        ).select(
            "total", "n_vocab", F.lit(order).alias("order"),
            F.lit(1).alias("min_count"),
        ).write.mode("overwrite").parquet(f"{path}/meta.parquet")

    def build_new(path: str) -> None:
        textstats.build_lm_snapshot(ref, path, order=order)

    out = {"old_sequential": [], "new_pooled": []}
    loads = []
    for rep in range(reps):
        for label, fn in (
            ("old_sequential", build_old), ("new_pooled", build_new)
        ):
            loads.append(round(os.getloadavg()[0], 2))
            t0 = time.time()
            fn(f"{snap}/{label}")
            out[label].append(round(time.time() - t0, 2))
            release_session_state(spark)
    rec = {
        "corpus": "100x sf0.1 documents (even half as reference)",
        "order": order, "reps": reps, "legs": out,
        "min": {k: min(v) for k, v in out.items()},
        "loads_1m": loads,
    }
    print(json.dumps(rec))
    with open("/root/repo/LM_BUILD_AB_r12.json", "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
