"""Measured scaling evidence: replicate the sf0.1 fixtures 10x and time
the headline plans at both sizes.

The correctness fixtures stop at sf0.1, and each table there is ONE
parquet file with ONE row group — so every scan is single-core and
absolute bench numbers carry that floor (see bench.py).  This experiment
answers the question the fixtures can't: do the PLANS scale?  It derives
a 10x corpus from the committed sf0.1 data (no new synthetic
distributions — fact tables are unioned with key shifts, dimensions stay
fixed, document text gets a per-copy suffix so the near-dup structure is
preserved rather than degenerating into 10-way exact duplicates), writes
it as 16-file parquet (a realistic splittable layout), and times a
representative query subset at sf0.1 vs 10x with bench.py's
execution-only min-of-3 method.

A scale-correct plan should show wall-time ratios ~<= 10 on 32 cores
(sub-linear where the single-file floor disappears, ~linear where the
work is genuinely 10x); a scale-broken plan (quadratic candidate
generation, single-partition stage) shows >> 10.

Usage: python scripts/scale_experiment.py [out_dir]   # default /tmp/maple_sfx10
Writes one JSON line: {"queries": {name: {"sf01": s, "x10": s, "ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10
N_FILES = 16

#: representative plan families: scan+agg, multi-join star, window,
#: exact dedup, minhash dedup, text stats, event rollup, corpus pipeline
QUERIES = [
    "a2_groupby_q1",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "w1_window_rank",
    "d1_dedup_exact",
    "d3_minhash_lsh",
    "t1_text_stats",
    "st1_hourly_agg",
    "cp1_corpus_pipeline",
    "o3_topk",
    "t15_weighted_sample",
    "j3_sort_merge_join",
    "q18_large_volume_customer",
    "aj1_asof_join",
    "sim1_cosine_topk",
    "a4_count_distinct",
    "set_union",
    "d5_dedup_clusters",
    "sim3_lsh_topk",
    "t11_decontaminate",
    "cp2_curation_pipeline",
    "st3_sliding_window",
    "ts1_gapfill",
    # round-5 additions (VERDICT r4 task 7): every quadratic-tier and
    # round-4 plan gets a measured ratio
    "d2_ngram_jaccard",
    "sim2_embedding_near_dup",
    "sim5_semdedup",
    "rj2_interval_overlap",
    "o1_sort_rownum",
    "t16_ngram_counts",
    "d6_cross_dedup",
    "st7_cross_dedup_stream",
    # round-6 addition: the full pretraining-ingest capstone
    "cp3_pretraining_ingest",
]

#: sim5's deterministic-Lloyd quantizer runs Spark jobs at
#: DataFrame-construction time (centroid-metadata collects) — time the
#: construction too, mirroring bench.py's CONSTRUCT_TIMED
CONSTRUCT_TIMED = {"sim5_semdedup"}

#: honest-quadratic tiers: minutes-long at 10x (Θ(n²) work by design —
#: the ratio IS the evidence), so time ONE run instead of warmup+min-of-3
#: (at that duration codegen warmup is amortized noise)
SINGLE_RUN = {"d2_ngram_jaccard", "sim2_embedding_near_dup", "d5_dedup_clusters"}

# (table, key columns to shift per copy) — dimensions replicate once
FACT_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

#: keys sharing a value DOMAIN must shift by ONE shared span, or the
#: lineitem->orders foreign key breaks for every copy > 0 whenever the
#: two sides' max keys differ (see scripts/scale100_experiment.py)
KEY_DOMAIN = {
    ("lineitem", "l_orderkey"): "orderkey",
    ("orders", "o_orderkey"): "orderkey",
}


def build(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from maple_spark.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        df = load_table(spark, SRC, t)
        df.repartition(4).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    # one span per key DOMAIN (max over every table/key in the domain)
    dom_max = {}
    for t, keys in FACT_SHIFTS.items():
        base = load_table(spark, SRC, t)
        for k in keys:
            m = base.agg(F.max(k)).first()[0]
            dom = KEY_DOMAIN.get((t, k), f"{t}.{k}")
            dom_max[dom] = max(dom_max.get(dom, -1), m)
    for t, keys in FACT_SHIFTS.items():
        base = load_table(spark, SRC, t)
        span = {
            k: dom_max[KEY_DOMAIN.get((t, k), f"{t}.{k}")] + 1 for k in keys
        }
        parts = []
        for i in range(COPIES):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * span[k]))
            if t == "documents":
                # keep the near-dup structure: a per-copy suffix makes
                # copies distinct-but-similar instead of exact duplicates
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copy{i}"))
                )
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        out.repartition(N_FILES).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )


def timeit(df) -> float:
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    import __spark_entry__ as entrymod
    from maple_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/maple_sfx10"
    spark = get_spark(app_name="scale_experiment")
    # embeddings is the LAST table build() writes: a build that died
    # mid-way (e.g. in the documents mutation) must not be treated
    # as complete on rerun
    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        build(spark, out_dir)

    qs = entrymod.queries()
    qs["s1_scan_filter"](spark, SRC).write.format("noop").mode("overwrite").save()

    def run(name: str, sf_dir: str) -> float:
        if name in SINGLE_RUN:
            # construction is INSIDE the clock: d5's connected-components
            # loop (eager checkpoints) runs while the frame is built, and
            # for the minutes-long quadratic tiers construction overhead
            # is noise anyway
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t0
        if name in CONSTRUCT_TIMED:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm codegen/caches
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            return best
        return timeit(qs[name](spark, sf_dir))

    results = {}
    for name in QUERIES:
        small = run(name, SRC)
        big = run(name, out_dir)
        results[name] = {
            "sf01": round(small, 3),
            "x10": round(big, 3),
            "ratio": round(big / small, 2) if small > 0 else None,
        }
        print(f"{name:24s} sf0.1 {small:6.3f}s  x10 {big:7.3f}s  ratio {big/small:5.2f}", file=sys.stderr)
    print(json.dumps({"copies": COPIES, "queries": results}))


if __name__ == "__main__":
    main()
