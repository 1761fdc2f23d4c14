"""cp6 stage ledger (round 13): attribute the capstone's wall clock to
its phases so the optimization attacks the largest one (guide §1) —

  A. dedup reference snapshot build alone (build_reference_snapshot)
  B. LM snapshot build alone (build_lm_snapshot, order=2)
  C. both builds through the shipped 2-thread pool (what cp6 runs)
  D. gopher gate -> lm_score -> eager localCheckpoint of the admission
     table (the scored barrier)
  E. the remaining execution: survivors re-attach, snapshot dedup
     guard, final anti-join, to the noop sink

Phases run in dependency order inside each rep (D needs B's snapshot,
E needs A's and D's outputs); min-of-N per phase across reps.  The sum
of phase minimums approximates the cp6 clock (same session, same
methodology as the bench's CONSTRUCT_TIMED timing).

Usage: python scripts/r13_cp6_ledger.py [reps] [sf_dir]
Writes CP6_LEDGER_r13.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from maple_spark.pipelines import curation, dedup, textstats
    from maple_spark.session import get_spark, release_session_state

    spark = get_spark(app_name="r13_cp6_ledger")
    d = entry._t(spark, sf_dir, "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    inc = d.where(F.col("doc_id") % 2 == 1)
    dsnap = entry._snapshot_root(sf_dir, "cp6_ledger_dedup")
    lmsnap = entry._snapshot_root(sf_dir, "cp6_ledger_lm")

    legs: dict[str, list[float]] = {k: [] for k in "ABCDE"}
    loads = []

    def clock(key, fn):
        loads.append(round(os.getloadavg()[0], 2))
        t0 = time.time()
        out = fn()
        legs[key].append(round(time.time() - t0, 3))
        return out

    for _ in range(reps):
        clock("A", lambda: dedup.build_reference_snapshot(
            ref, dsnap, "doc_id", "text", num_perm=64, bands=16, k=8))
        release_session_state(spark)
        clock("B", lambda: textstats.build_lm_snapshot(ref, lmsnap, order=2))
        release_session_state(spark)

        def pooled():
            with ThreadPoolExecutor(max_workers=2) as pool:
                fd = pool.submit(
                    dedup.build_reference_snapshot,
                    ref, dsnap, "doc_id", "text",
                    num_perm=64, bands=16, k=8,
                )
                fl = pool.submit(
                    textstats.build_lm_snapshot, ref, lmsnap, order=2
                )
                fd.result(), fl.result()

        clock("C", pooled)
        release_session_state(spark)

        def scored_ckpt():
            gated = (
                curation.gopher_quality_rules(
                    inc, min_words=30, min_stop_hits=1, carry_cols=("text",)
                )
                .where("keep")
                .select("doc_id", "text")
            )
            return (
                textstats.lm_score(gated, lmsnap)
                .where(F.col("xent") <= 3.46)
                .localCheckpoint(eager=True)
            )

        scored = clock("D", scored_ckpt)

        def tail():
            survivors = inc.join(scored.select("doc_id"), "doc_id")
            dups = (
                dedup.cross_dedup_stream(
                    survivors, None, "doc_id", "text",
                    num_perm=64, bands=16, k=8,
                    jaccard_threshold=0.2, reference_snapshot=dsnap,
                    carry_sets=False,
                )
                .select(F.col("new_id").alias("doc_id"))
                .distinct()
            )
            scored.join(dups, "doc_id", "left_anti").select(
                "doc_id", "n_words", "n_oov", "xent"
            ).write.format("noop").mode("overwrite").save()

        clock("E", tail)
        release_session_state(spark)

    rec = {
        "sf_dir": sf_dir,
        "reps": reps,
        "phases": {
            "A_dedup_snapshot_alone": legs["A"],
            "B_lm_snapshot_alone": legs["B"],
            "C_both_builds_pooled": legs["C"],
            "D_gate_score_checkpoint": legs["D"],
            "E_guard_and_final_join": legs["E"],
        },
        "min": {k: min(v) for k, v in legs.items()},
        "loads_1m": loads,
    }
    print(json.dumps(rec))
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CP6_LEDGER_r13.json",
        ),
        "w",
    ) as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
