"""100× scale check for the round-9 second-wave operators (d7, st8).

st8 runs as registered (linear: union → one key exchange).  d7 runs in
its 100 TB composition — canonical_docs over the d3 LSH pair list —
because the registry entry's exact-Jaccard edge source is the
deliberately-quadratic tier the 100× sweep excludes by design (see
scale100_experiment.py docstring); at corpus scale edges come from LSH.
Output: NEWOPS_SCALE_r09.json {query: {sf01, x100, ratio}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from scale100_experiment import SRC, build, release_session_state, timeit  # noqa: E402


def d7_lsh_edges(spark, sf_dir):
    from pyspark.sql import functions as F

    from maple_spark.catalog import load_table
    from maple_spark.pipelines import dedup, textstats

    d = load_table(spark, sf_dir, "documents")
    scored = textstats.quality_score(d).select("doc_id", "quality")
    pairs = dedup.minhash_lsh_pairs(
        d, "doc_id", "text", num_perm=64, bands=16, k=8, jaccard_threshold=0.2
    ).select(F.col("id_a"), F.col("id_b"))
    return dedup.canonical_docs(scored, pairs, "doc_id", "quality").select(
        "doc_id", "cluster_id", "quality", "kept"
    )


def main() -> None:
    import __spark_entry__ as entrymod
    from maple_spark.session import get_spark

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/maple_sfx100"
    spark = get_spark(app_name="new_ops_scale")
    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        t0 = time.time()
        build(spark, out_dir)
        print(f"built {out_dir} in {time.time() - t0:.0f}s", file=sys.stderr)

    qs = entrymod.queries()
    qs["s1_scan_filter"](spark, SRC).write.format("noop").mode("overwrite").save()

    targets = {
        "st8_stream_dedup": lambda sf: qs["st8_stream_dedup"](spark, sf),
        "d7_canonical_docs_lsh": lambda sf: d7_lsh_edges(spark, sf),
        # bpe1 is builder-eager (k argmax collects), so timeit's noop
        # writes only re-run the final LocalTableScan; time the BUILD
        "bpe1_bpe_merges": lambda sf: qs["bpe1_bpe_merges"](spark, sf),
        # bpe2 learns (eager) then counts (lazy); build-timed for the
        # honest end-to-end cost, like bench.py's CONSTRUCT_TIMED set
        "bpe2_bpe_token_counts": lambda sf: qs["bpe2_bpe_token_counts"](
            spark, sf
        ),
    }
    # d7 is here too: connected_components runs EAGERLY at build time
    # (label-propagation loop with localCheckpoint+count actions), so a
    # noop-write-only clock would miss the clustering — the heart of
    # the operator (code-review r9 finding)
    construct_timed = {
        "bpe1_bpe_merges",
        "bpe2_bpe_token_counts",
        "d7_canonical_docs_lsh",
    }

    def measure(fn, sf, runs):
        best = float("inf")
        for _ in range(runs):
            # construct-timed builders allocate broadcasts and
            # localCheckpoint RDDs PER BUILD; without a release between
            # repeated builds they accumulate on the driver and the
            # 100x d7 run dies in a BroadcastExchange (the scale100
            # sweep's artifact, one level down).  Runs outside the
            # timed region.
            release_session_state(spark)
            t0 = time.time()
            fn(sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    results = {"load_avg_1m_start": round(os.getloadavg()[0], 2)}
    for name, fn in targets.items():
        release_session_state(spark)
        if name in construct_timed:
            fn(SRC)  # warm codegen/caches once, untimed
            small = measure(fn, SRC, runs=3)
            fn(out_dir)
            big = measure(fn, out_dir, runs=2)
        else:
            small = timeit(fn(SRC), runs=3)
            big = timeit(fn(out_dir), runs=2)
        results[name] = {
            "sf01": round(small, 3),
            "x100": round(big, 3),
            "ratio": round(big / small, 2),
        }
        print(
            f"{name:24s} sf0.1 {small:6.3f}s  x100 {big:8.3f}s"
            f"  ratio {big / small:6.2f}",
            file=sys.stderr,
        )
    results["load_avg_1m_end"] = round(os.getloadavg()[0], 2)
    with open("/root/repo/NEWOPS_SCALE_r09.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
