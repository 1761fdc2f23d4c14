"""Round-12 LM-family scale legs: t22 sweep + t20s stage attribution.

Two claims to pin with measurements (VERDICT r11 tasks 4/5 done-bars):

- t22 (4-gram stupid-backoff): the 100x/sf0.1 wall ratio under the
  24 GiB one-box harness — the t20/t21 token-volume regime one order up
  (their keys collapse ~nothing, so ~27-30x at 100x is the honest
  expectation, still sublinear vs ~240x character volume).
- t20s (snapshot backoff LM): build (fit + persist the bigram model,
  once per reference snapshot) vs score (the per-crawl-increment cost)
  SEPARATELY, at sf0.1 and 100x — stage attribution from birth, the
  lesson r10's d6s learned late.

One leg per process (a session that has run one leg's ~500 stages can
die in a driver BroadcastExchange on the next — scale-sweep hygiene):

    SPARK_GRAFT_DRIVER_MEM=24g python scripts/r12_lm_scale.py sf01
    SPARK_GRAFT_DRIVER_MEM=24g python scripts/r12_lm_scale.py x100
    # second wave — the production-order tier, its own fresh legs:
    SPARK_GRAFT_DRIVER_MEM=24g python scripts/r12_lm_scale.py t23_sf01
    SPARK_GRAFT_DRIVER_MEM=24g python scripts/r12_lm_scale.py t23_x100
    # capstone, stage-attributed (build-once vs increment path):
    SPARK_GRAFT_DRIVER_MEM=24g python scripts/r12_lm_scale.py cp6_sf01
    SPARK_GRAFT_DRIVER_MEM=24g python scripts/r12_lm_scale.py cp6_x100

Each leg merges into LM_SCALE_r12.json:
  {leg: {t22_sec, t20s_build_sec, t20s_score_sec, runs, load_min, load_max}}
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
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/LM_SCALE_r12.json"


def _merge(leg: str, payload: dict) -> None:
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data[leg] = payload
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({leg: payload}))


def main() -> None:
    leg = sys.argv[1] if len(sys.argv) > 1 else "sf01"
    sf_dir = SF01 if leg.endswith("sf01") else X100

    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from maple_spark.catalog import load_table
    from maple_spark.pipelines import textstats
    from maple_spark.pipelines.sampling import md5_draw16
    from maple_spark.session import get_spark

    spark = get_spark(app_name=f"r12_lm_scale_{leg}")
    if leg != "sf01" and not os.path.exists(f"{X100}/embeddings.parquet"):
        build(spark, X100)

    d = load_table(spark, sf_dir, "documents")
    train = d.where(
        md5_draw16(F.concat(F.lit("lm|"), F.col("doc_id").cast("string"))) % 2
        == 0
    )
    snap = e._snapshot_root(sf_dir, "lm2_scale")

    def t22():
        e.t22_fourgram_perplexity(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def t20s_build():
        textstats.build_lm_snapshot(train, snap, order=2)

    def t20s_score():
        textstats.lm_score(d, snap).write.format("noop").mode(
            "overwrite"
        ).save()

    def t23():
        e.t23_fivegram_perplexity(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def cp6_build():
        from maple_spark.pipelines import dedup as _dd

        ref = d.where(F.col("doc_id") % 2 == 0)  # the entry's parity ref
        _dd.build_reference_snapshot(
            ref, f"{snap}_cp6d", "doc_id", "text",
            num_perm=64, bands=16, k=8,
        )
        textstats.build_lm_snapshot(ref, f"{snap}_cp6lm", order=2)

    def cp6_increment():
        # the per-crawl-increment path: gopher -> persisted-LM band ->
        # id-only guard against the persisted buckets (cp6's stages 1-3
        # with the entry's exact parameterization, snapshots REUSED)
        from maple_spark.pipelines import dedup as _dd
        from maple_spark.pipelines.curation import gopher_quality_rules

        inc = d.where(F.col("doc_id") % 2 == 1)
        gk = (
            gopher_quality_rules(inc, min_words=30, min_stop_hits=1)
            .where("keep")
            .select("doc_id")
        )
        gated = inc.join(gk, "doc_id")
        scored = textstats.lm_score(gated, f"{snap}_cp6lm").where(
            F.col("xent") <= 3.46
        )
        survivors = gated.join(scored.select("doc_id"), "doc_id")
        dups = (
            _dd.cross_dedup_stream(
                survivors, None, "doc_id", "text", num_perm=64, bands=16,
                k=8, jaccard_threshold=0.2,
                reference_snapshot=f"{snap}_cp6d", carry_sets=False,
            )
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )
        scored.join(dups, "doc_id", "left_anti").write.format(
            "noop"
        ).mode("overwrite").save()

    if leg.startswith("t23"):
        # the round's second wave: the production-order tier, its own
        # fresh-process legs (t23_sf01 / t23_x100)
        arms = [("t23_sec", t23)]
        t23()
    elif leg.startswith("cp6"):
        # stage-attributed capstone legs (cp6_sf01 / cp6_x100): the
        # once-per-snapshot build vs the per-increment path.  NOTE: the
        # increment here is the parity HALF-corpus — the worst-case
        # regime; production increments are the small-increment side of
        # INCREMENT_CURVE_r12.  train (doc_id%2=0) is the reference.
        arms = [("cp6_build_sec", cp6_build),
                ("cp6_increment_sec", cp6_increment)]
        cp6_build()
        cp6_increment()
    else:
        arms = [("t22_sec", t22), ("t20s_build_sec", t20s_build),
                ("t20s_score_sec", t20s_score)]
        # warm (untimed): JVM, codegen, parquet footers; build runs
        # first so score always has a snapshot to read
        t20s_build()
        t20s_score()
        t22()
    runs = int(os.environ.get("LM_SCALE_RUNS", "2"))
    best = {k: float("inf") for k, _ in arms}
    loads = []
    for _ in range(runs):
        for key, fn in arms:
            release_session_state(spark)
            t0 = time.time()
            fn()
            best[key] = min(best[key], time.time() - t0)
            loads.append(round(os.getloadavg()[0], 2))
    _merge(leg, {
        **{k: round(v, 3) for k, v in best.items()},
        "runs": runs,
        "load_min": min(loads),
        "load_max": max(loads),
    })


if __name__ == "__main__":
    main()
