"""Stage-attributed, SAME-SESSION A/B for d7's 100x cost (VERDICT r9
task 4).

The r9 claim — d7-with-LSH-edges' 34x wall at 100x decomposes as ~104 s
of d3 edge generation plus a ~30% canonicalization overlay — was
INFERRED from two different runs (SCALE100_r8 vs NEWOPS_SCALE_r09).
This script measures the decomposition honestly: edges-only (A) and
full canonicalization over those edges (B) run INTERLEAVED in one
session (A,B,A,B,... min-of-N), at sf0.1 and at the 100x corpus, so
host drift hits both arms alike.  A third arm (C) isolates the CC loop
+ label join + keeper window on PRE-MATERIALIZED edges, and the CC
round count is recorded per scale via the connected_components stats
hook — pinning whether iteration count (not just edge volume) grows
with corpus size on the synthetic dup structure.

Output: D7_STAGE_AB_r10.json
  {scale: {edges_only, full, cc_on_edges, overlay_pct, cc_rounds, n_edges}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from scale100_experiment import SRC, build, release_session_state  # noqa: E402


def _edges(spark, sf_dir):
    from pyspark.sql import functions as F

    from maple_spark.catalog import load_table
    from maple_spark.pipelines import dedup

    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=64, bands=16, k=8,
        jaccard_threshold=0.2,
    ).select("id_a", "id_b")


def _full(spark, sf_dir, cc_stats=None):
    from maple_spark.catalog import load_table
    from maple_spark.pipelines import dedup, textstats

    d = load_table(spark, sf_dir, "documents")
    scored = textstats.quality_score(d).select("doc_id", "quality")
    return dedup.canonical_docs(
        scored, _edges(spark, sf_dir), "doc_id", "quality",
        cc_stats=cc_stats,
    ).select("doc_id", "cluster_id", "quality", "kept")


def _canon_on(spark, sf_dir, edges_df, cc_stats=None):
    from maple_spark.catalog import load_table
    from maple_spark.pipelines import dedup, textstats

    d = load_table(spark, sf_dir, "documents")
    scored = textstats.quality_score(d).select("doc_id", "quality")
    return dedup.canonical_docs(
        scored, edges_df, "doc_id", "quality", cc_stats=cc_stats
    ).select("doc_id", "cluster_id", "quality", "kept")


def main() -> None:
    from maple_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/maple_sfx100"
    # optional leg selector: run each scale in a FRESH process — the
    # x100 full arm localCheckpoints corpus-scale edge tables, and a
    # session that has already run the sf0.1 leg's ~500 stages can die
    # in a driver BroadcastExchange (notEnoughMemoryToBuildAndBroadcast,
    # observed on the first combined run) that a fresh session never
    # hits; results merge into the same JSON
    leg = sys.argv[2] if len(sys.argv) > 2 else "both"
    runs = int(os.environ.get("D7_AB_RUNS", "3"))
    spark = get_spark(app_name="d7_stage_ab")
    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        t0 = time.time()
        build(spark, out_dir)
        print(f"built {out_dir} in {time.time() - t0:.0f}s", file=sys.stderr)

    def clock(fn):
        """One timed execution: build + noop write (d7's CC loop runs
        eagerly at build, so construction must sit inside the clock —
        the same rule as new_ops_scale's construct_timed set)."""
        release_session_state(spark)
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    path = "/root/repo/D7_STAGE_AB_r10.json"
    results: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    results[f"load_avg_1m_start_{leg}"] = round(os.getloadavg()[0], 2)
    legs = [("sf0.1", SRC), ("x100", out_dir)]
    for label, sf in legs:
        if leg not in ("both", label):
            continue
        n = 2 if sf == out_dir else runs
        # warm both arms once, untimed (codegen/relation caches)
        clock(lambda: _edges(spark, sf))
        clock(lambda: _full(spark, sf))
        a = b = float("inf")
        for _ in range(n):  # interleaved: drift hits both arms alike
            a = min(a, clock(lambda: _edges(spark, sf)))
            b = min(b, clock(lambda: _full(spark, sf)))
        # arm C: canonicalization cost alone, edges pre-materialized
        release_session_state(spark)
        edges_mat = _edges(spark, sf).localCheckpoint(eager=True)
        n_edges = edges_mat.count()
        cc_stats: dict = {}
        c = min(
            clock(lambda: _canon_on(spark, sf, edges_mat, cc_stats))
            for _ in range(n)
        )
        results[label] = {
            "edges_only": round(a, 3),
            "full": round(b, 3),
            "cc_on_edges": round(c, 3),
            "overlay_pct": round(100.0 * (b - a) / a, 1),
            "cc_rounds": cc_stats.get("rounds"),
            "cc_cadence": cc_stats.get("cadence"),
            "n_edges": n_edges,
        }
        print(
            f"{label:6s} edges {a:7.2f}s  full {b:7.2f}s "
            f"(overlay {100 * (b - a) / a:5.1f}%)  canon-on-edges "
            f"{c:6.2f}s  cc_rounds {cc_stats.get('rounds')} "
            f"edges {n_edges}",
            file=sys.stderr,
        )
        edges_mat.unpersist()
    results[f"load_avg_1m_end_{leg}"] = round(os.getloadavg()[0], 2)
    results["runs_per_arm"] = runs
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
