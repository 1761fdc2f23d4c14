"""Round-12 third-wave scale legs: t26 (DSIR) and d8 (bloom guard).

Claims to pin with measurements:

- t26 (DSIR selection): end-to-end (featurize + fit + score + top-k)
  at sf0.1 vs 100x.  Expectation: the token-volume regime (the corpus
  explode dominates; the model side is FIXED at 512 buckets no matter
  the scale — that is the operator's design point), so the ratio
  should land near the LM tiers' ~token-volume slope and the
  fit/score tables' growth contributes ~nothing.
- d8 (bloom admission guard): end-to-end (reference build + probe +
  candidate-side verify), plus the PROBE-ONLY stage (bloom reused,
  the per-increment cost a production ingest pays) — stage
  attribution from birth, the d6s lesson.

One leg per process (scale-sweep hygiene):

    SPARK_GRAFT_DRIVER_MEM=24g python scripts/r12_newops_scale.py sf01
    SPARK_GRAFT_DRIVER_MEM=24g python scripts/r12_newops_scale.py x100

Each leg merges into NEWOPS_SCALE_r12.json:
  {leg: {t26_sec, d8_sec, d8_probe_sec, runs, load_min, load_max}}
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
OUT = "/root/repo/NEWOPS_SCALE_r12.json"


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
    from maple_spark.pipelines import dedup as dd
    from maple_spark.session import get_spark

    spark = get_spark(app_name=f"r12_newops_scale_{leg}")
    if leg != "sf01" and not os.path.exists(f"{X100}/embeddings.parquet"):
        build(spark, X100)

    d = load_table(spark, sf_dir, "documents")
    batch = d.where(F.col("doc_id") % 2 == 1)
    ref = d.where(F.col("doc_id") % 2 == 0)

    def t26():
        e.t26_dsir_select(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def d8():
        e.d8_bloom_guard(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # probe-only: hold ONE bloom build across repeats by reusing the
    # guard with expected_items pinned (same m/k) and a pre-counted
    # reference — the per-increment cost is the probe + candidate
    # verify, which is what this stage isolates.  The guard has no
    # split API (the bloom is plan-internal), so probe-only here means
    # "end-to-end minus the count job", with the count hoisted out.
    n_ref = ref.count()

    def d8_probe():
        dd.bloom_membership_guard(
            batch, ref, "doc_id", "text", fpp=0.01, expected_items=n_ref
        ).write.format("noop").mode("overwrite").save()

    arms = [("t26_sec", t26), ("d8_sec", d8), ("d8_probe_sec", d8_probe)]
    # warm (untimed): JVM, codegen, parquet footers
    t26()
    d8_probe()
    runs = int(os.environ.get("NEWOPS_SCALE_RUNS", "2"))
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
