"""Hybrid-vs-distributed BPE measurement (round 10): the numbers backing
SCALE.md's bpe regime table, as a committed artifact.

Arms, one session, interleaved where compared:
  - k=64 at sf0.01: distributed bpe_merges vs bpe_merges_hybrid, with
    EQUALITY asserted on the learned rule sequence (the judge-prescribed
    gate, same as tests/test_pipelines.py's pin);
  - k=1024 at sf0.1 on the natural corpus (hybrid; honestly EXHAUSTS at
    ~89 merges — the synthetic vocabulary is 31 words);
  - k=1024 at sf0.1 on a vocab-rich derivation (spaces -> underscores:
    each document becomes one long word, ~60k distinct sequences), where
    all 1024 merges actually learn — the regime a real tokenizer runs in.

Output: BPE_HYBRID_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    from pyspark.sql import functions as F

    from maple_spark.pipelines.textstats import bpe_merges, bpe_merges_hybrid
    from maple_spark.session import get_spark, release_session_state

    spark = get_spark(app_name="bpe_hybrid_ab")
    results: dict = {"load_avg_1m_start": round(os.getloadavg()[0], 2)}

    def clock(fn, runs=2):
        best, out = float("inf"), None
        for _ in range(runs):
            release_session_state(spark)
            t0 = time.time()
            out = [tuple(r) for r in fn().collect()]
            best = min(best, time.time() - t0)
        return best, out

    d001 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    d01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    rich = d01.select(F.regexp_replace("text", " ", "_").alias("text"))

    # warm once
    bpe_merges_hybrid(d001, k=4).collect()

    # interleaved A/B at the equality gate's shape
    a = b = float("inf")
    rows_a = rows_b = None
    for _ in range(2):
        ta, rows_a = clock(lambda: bpe_merges(d001, "text", k=64), runs=1)
        tb, rows_b = clock(lambda: bpe_merges_hybrid(d001, "text", k=64), runs=1)
        a, b = min(a, ta), min(b, tb)
    assert rows_a == rows_b, "tier divergence at k=64"
    results["k64_sf001"] = {
        "distributed": round(a, 2),
        "hybrid": round(b, 2),
        "speedup": round(a / b, 1),
        "equal": True,
        "n_merges": len(rows_a),
    }

    t, rows = clock(lambda: bpe_merges_hybrid(d01, "text", k=1024))
    results["k1024_sf01_natural"] = {
        "hybrid": round(t, 2),
        "n_merges_learned": len(rows),
        "note": "31-word synthetic vocabulary exhausts at ~89 merges",
    }

    t, rows = clock(lambda: bpe_merges_hybrid(rich, "text", k=1024))
    results["k1024_sf01_vocab_rich"] = {
        "hybrid": round(t, 2),
        "n_merges_learned": len(rows),
        "note": "spaces->underscores derivation; all merges learn",
    }

    results["load_avg_1m_end"] = round(os.getloadavg()[0], 2)
    with open("/root/repo/BPE_HYBRID_r10.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
