"""Round-11 measurement legs (VERDICT r10 tasks 2 + 3).

Two open measurement-honesty items from the r10 verdict:

1. ``d6s_snapshot_guard``'s sweep number (314 s at 100x, ratio 59x)
   conflates the once-per-snapshot BUILD with the per-increment GUARD —
   the amortized regime a deployment sees is the guard alone (11-13 s in
   SNAPSHOT_AMORT_r09).  Same note, milder, for sim4s (its sf0.1 number
   includes Lloyd training).  This script stage-attributes both probes:
   build and probe timed SEPARATELY, interleaved build,probe,build,probe
   in one session so host drift hits both stages alike.

2. t19's r10 100x ratio (19.8x) was measured at load 30.5 with no
   same-session bracket, and t13's 21.2x was likewise sweep-confounded
   (sweep load hit 33).  This script re-runs both ops per the drift
   protocol: fresh process per scale leg, arms INTERLEAVED
   (t19,t13,t19,t13,... min-of-N), loadavg recorded around every
   measurement.

Legs (each a fresh process — the d7_stage_ab lesson: a session that ran
one leg's stages can die in a driver BroadcastExchange on the next):

    python scripts/r11_stage_and_drift.py snap  sf01|x100
    python scripts/r11_stage_and_drift.py lm    sf01|x100
    python scripts/r11_stage_and_drift.py drift sf01|x100

x100 legs need SPARK_GRAFT_DRIVER_MEM=24g (t19's (doc,word) agg OOMs
the default 8 GiB single JVM — harness memory-per-core, not dataflow;
see SCALE.md).  Results merge into SNAPSHOT_STAGE_r11.json /
T19_T13_AB_r11.json.
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
    release_session_state,
)

X100 = "/tmp/maple_sfx100"


def _merge(path: str, patch: dict) -> None:
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    for k, v in patch.items():
        # overwrite unless BOTH sides are dicts: setdefault on a key an
        # older-format JSON holds as a scalar would return that scalar
        # and .update would crash AFTER the expensive measurement ran
        # (ADVICE round 11)
        if isinstance(v, dict) and isinstance(data.get(k), dict):
            data[k].update(v)
        else:
            data[k] = v
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(patch))


def _bracket(fn):
    """Run fn(), return (seconds, load_before, load_after)."""
    l0 = os.getloadavg()[0]
    t0 = time.time()
    fn()
    return time.time() - t0, round(l0, 2), round(os.getloadavg()[0], 2)


def snap_leg(spark, sf_dir: str, scale: str, runs: int) -> None:
    """Stage-attributed snapshot probes: build vs guard/probe, interleaved."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from maple_spark.catalog import load_table
    from maple_spark.pipelines import dedup, similarity

    out: dict = {}
    loads: list = []

    d = load_table(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 2 == 1)
    ref = d.where(F.col("doc_id") % 2 == 0)
    dsnap = e._snapshot_root(sf_dir, "dedup_ref_stage")

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    isnap = e._snapshot_root(sf_dir, "ivf_stage")

    def d6_build():
        dedup.build_reference_snapshot(
            ref, dsnap, "doc_id", "text", num_perm=64, bands=16, k=8
        )

    def d6_guard():
        dedup.cross_dedup_stream(
            new, None, "doc_id", "text", num_perm=64, bands=16, k=8,
            jaccard_threshold=0.2, reference_snapshot=dsnap,
        ).write.format("noop").mode("overwrite").save()

    def s4_build():
        similarity.build_ivf_snapshot(emb, isnap, n_cells=8, lloyd_iters=2)

    def s4_probe():
        similarity.ivf_topk(
            emb, q, k=5, n_cells=8, n_probe=3, ivf_snapshot=isnap
        ).write.format("noop").mode("overwrite").save()

    arms = {
        "d6s_build": d6_build,
        "d6s_guard": d6_guard,
        "sim4s_build": s4_build,
        "sim4s_probe": s4_probe,
    }
    # one untimed warm pass (codegen + snapshot exists for the guards)
    for fn in arms.values():
        fn()
    best = {k: float("inf") for k in arms}
    for _ in range(runs):
        for name, fn in arms.items():
            release_session_state(spark)
            sec, l0, l1 = _bracket(fn)
            best[name] = min(best[name], sec)
            loads.append(l1)
    for name, sec in best.items():
        out[name] = round(sec, 3)
    out["guard_pct_of_probe_entry"] = round(
        100.0 * out["d6s_guard"] / (out["d6s_build"] + out["d6s_guard"]), 1
    )
    out["load_min"] = min(loads)
    out["load_max"] = max(loads)
    _merge("/root/repo/SNAPSHOT_STAGE_r11.json", {scale: out})


def lm_leg(spark, sf_dir: str, scale: str, runs: int) -> None:
    """t19s stage attribution: LM snapshot build vs snapshot-read score
    (the round-11 probe gets the same build/probe split as d6s/sim4s
    from birth — its sweep number must never repeat the d6s conflation)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    from maple_spark.catalog import load_table
    from maple_spark.pipelines import textstats
    from maple_spark.pipelines.sampling import md5_draw16

    d = load_table(spark, sf_dir, "documents")
    train = d.where(
        md5_draw16(F.concat(F.lit("lm|"), F.col("doc_id").cast("string"))) % 2
        == 0
    )
    snap = e._snapshot_root(sf_dir, "lm_stage")

    def lm_build():
        textstats.build_lm_snapshot(train, snap)

    def lm_score():
        textstats.lm_score(d, snap).write.format("noop").mode(
            "overwrite"
        ).save()

    arms = {"t19s_build": lm_build, "t19s_score": lm_score}
    for fn in arms.values():
        fn()
    best = {k: float("inf") for k in arms}
    loads: list = []
    for _ in range(runs):
        for name, fn in arms.items():
            release_session_state(spark)
            sec, l0, l1 = _bracket(fn)
            best[name] = min(best[name], sec)
            loads.append(l1)
    out = {k: round(v, 3) for k, v in best.items()}
    out["lm_load_min"] = min(loads)
    out["lm_load_max"] = max(loads)
    _merge("/root/repo/SNAPSHOT_STAGE_r11.json", {scale: out})


def drift_leg(spark, sf_dir: str, scale: str, runs: int) -> None:
    """t19 + t13 interleaved min-of-N with load brackets."""
    import __spark_entry__ as e
    from scale100_experiment import measure_construct

    qs = e.queries()
    # t20 rides the same protocol: its first 100x leg (VERDICT r10
    # task 4) lands load-bracketed from birth
    arms = (
        "t19_perplexity_score",
        "t13_pii_scrub",
        "t20_bigram_perplexity",
        "t21_trigram_perplexity",
    )
    out: dict = {}
    loads: list = []
    for name in arms:  # warm, untimed
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = {k: float("inf") for k in arms}
    for _ in range(runs):
        for name in arms:
            release_session_state(spark)
            fn = qs[name]
            sec, l0, l1 = _bracket(
                lambda: fn(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            best[name] = min(best[name], sec)
            loads.append(l1)
    for name, sec in best.items():
        out[name] = round(sec, 3)
    out["load_min"] = min(loads)
    out["load_max"] = max(loads)
    _merge("/root/repo/T19_T13_AB_r11.json", {scale: out})


def main() -> None:
    from maple_spark.session import get_spark

    kind = sys.argv[1]  # snap | drift
    leg = sys.argv[2]  # sf01 | x100
    sf_dir = SRC if leg == "sf01" else X100
    runs = int(os.environ.get("R11_RUNS", "3" if leg == "sf01" else "2"))
    spark = get_spark(app_name=f"r11_{kind}_{leg}")
    if leg == "x100" and not os.path.exists(f"{X100}/embeddings.parquet"):
        build(spark, X100)
    if kind == "snap":
        snap_leg(spark, sf_dir, leg, runs)
    elif kind == "lm":
        lm_leg(spark, sf_dir, leg, runs)
    elif kind == "drift":
        drift_leg(spark, sf_dir, leg, runs)
    else:
        # a typo must not silently run the wrong leg and corrupt a
        # committed measurement artifact (review finding, round 11)
        raise SystemExit(f"unknown leg kind {kind!r}: use snap|lm|drift")


if __name__ == "__main__":
    main()
