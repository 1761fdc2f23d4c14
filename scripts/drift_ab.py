"""Drift-flag adjudication (VERDICT r7 task 4 / r8 task 2).

BENCH_r07 flagged 7 queries >1.3x their best-prior floor on a round
whose code diff could not touch them — static bisect showed every
flagged query's code byte-identical between rounds, and this script's
r7 run measured a same-code pass-to-pass band up to 1.53x within ONE
session, confirming host noise.

BENCH_r08 raised 14 new flags (worst s1_scan_filter 1.70x, a pure
untouched scan) on a load_avg-5.3 run vs a 4.2 floor round.  Three of
them (t11/cp2/cp3) had a CANDIDATE code cause — "unstatable
intermediate routes the Arrow kernel in at sf0.1" — which round 9
refuted at the plan level before running this A/B: all three plans
carry ZERO ArrowEvalPython/BatchEvalPython nodes at sf0.1
(DataFrame.inputFiles() resolves file sources through joins and
column appends, so with_repetition_stats(clean) sees the 584 KB
parquet and keeps the expression tier).  With the code cause
eliminated, the r8 flag set is adjudicated the same way as r7's:
measure the same-code pass-to-pass band, interleaved, one session.

Pass structure q1..qN, q1..qN (so slow host phases hit both passes),
min-of-5 per query per pass; a pass ratio band comparable to the
cross-round drift flags (1.3-1.7x) confirms the flags are host noise.

Run: python scripts/drift_ab.py [sf_dir]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: BENCH_r08 drift_flags (r7's seven are a subset of the union; the r8
#: set supersedes it as the open adjudication).  Used only when no
#: committed BENCH file carries flags — flagged_queries() below reads
#: the LATEST round's drift_flags so future rounds adjudicate their own
#: flag set without editing this file.
FLAGGED_FALLBACK = [
    "s1_scan_filter",
    "a4_count_distinct",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "flagship_join_topk",
    "sim1_cosine_topk",
    "sim4_ivf_topk",
    "sim5_semdedup",
    "st1_hourly_agg",
    "t1_text_stats",
    "t11_decontaminate",
    "ts1_gapfill",
    "cp1_corpus_pipeline",
    "cp2_curation_pipeline",
]


def flagged_queries() -> list[str]:
    """drift_flags from the newest committed BENCH_r*.json (the open
    adjudication is always the latest round's), else the fallback."""
    import glob

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")), reverse=True):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if rec.get("rc") not in (0, None):
            continue  # same rule as bench.py: a failed run sets nothing
        flags = (rec.get("parsed") or {}).get("drift_flags")
        if flags is not None:
            # an explicit [] is a RECORD (a clean round with nothing to
            # adjudicate), not absence — falling through to an older
            # round would re-present already-closed flags as open
            return list(flags)
    return FLAGGED_FALLBACK


def min5(build):
    best = float("inf")
    for _ in range(5):
        df = build()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main():
    import __spark_entry__ as entrymod
    from maple_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load0 = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="drift_ab")
    qs = entrymod.queries()
    flagged = [n for n in flagged_queries() if n in qs]
    # warmup: codegen + parquet footers for every flagged query
    for name in flagged:
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
    passes: list[dict[str, float]] = []
    for _ in range(2):
        p = {}
        for name in flagged:
            p[name] = round(min5(lambda: qs[name](spark, sf)), 3)
        passes.append(p)
    ratio = {
        n: round(max(passes[0][n], passes[1][n]) / min(passes[0][n], passes[1][n]), 2)
        for n in flagged
    }
    print(
        json.dumps(
            {
                "sf_dir": sf,
                "flagged": flagged,
                "pass1": passes[0],
                "pass2": passes[1],
                "same_code_pass_ratio": ratio,
                "max_ratio": max(ratio.values()),
                "load_avg_1m_start": load0,
                "load_avg_1m_end": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
