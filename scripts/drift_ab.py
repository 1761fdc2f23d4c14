"""Drift-flag adjudication (VERDICT r7 task 4, carried from r6 task 5).

BENCH_r07 flagged 7 queries >1.3x their best-prior floor (worst
s1_scan_filter 1.54x) on a round whose code diff could not touch them —
static bisect (git diff r6-end..r7-end) shows every flagged query's code
byte-identical between rounds: __spark_entry__.py's r7 diff touches only
cp3, dedup.py's only the d2 gram tier, and textstats/similarity were not
modified at all.  A code-caused regression is therefore impossible; the
open question is only the size of the same-code noise band.

This script measures that band directly: each flagged query runs
min-of-5 in TWO interleaved passes within ONE session (pass structure
q1..q7, q1..q7 — so slow host phases hit both passes), reporting the
pass-to-pass ratio per query plus load_avg brackets.  A pass ratio band
comparable to the cross-round drift flags (1.3-1.5x) confirms the flags
are host noise, closing the loop the bench's prior_loads_1m field now
documents per-round.

Run: python scripts/drift_ab.py [sf_dir]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGGED = [
    "s1_scan_filter",
    "a4_count_distinct",
    "q6_forecast_revenue",
    "flagship_join_topk",
    "d3_minhash_lsh",
    "sim1_cosine_topk",
    "t1_text_stats",
]


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
    # warmup: codegen + parquet footers for every flagged query
    for name in FLAGGED:
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
    passes: list[dict[str, float]] = []
    for _ in range(2):
        p = {}
        for name in FLAGGED:
            p[name] = round(min5(lambda: qs[name](spark, sf)), 3)
        passes.append(p)
    ratio = {
        n: round(max(passes[0][n], passes[1][n]) / min(passes[0][n], passes[1][n]), 2)
        for n in FLAGGED
    }
    print(
        json.dumps(
            {
                "sf_dir": sf,
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
