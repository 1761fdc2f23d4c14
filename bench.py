"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
result materialization on the driver, no sink I/O) — the honest measure of
plan cost.  First a warmup query amortizes JVM/codegen startup so numbers
reflect steady-state execution.

Timed region = execution only: the DataFrame is constructed (Python plan
building + eager Catalyst analysis) BEFORE the clock starts, because that
driver-side cost is fixed per query, independent of data volume — at 100 TB
it is noise, at sf0.1 it would dominate wide plans (e.g. the 64-permutation
MinHash projection) and mis-rank optimizations that matter at scale.
Exception: CONSTRUCT_TIMED queries (sim4/sim5) run Spark jobs — the
deterministic-Lloyd quantizer — during construction, so for them the clock
covers construction too (that cost DOES scale with data volume).

Two harness-side floors on the numbers (measured, round 4):

- Every fixture table is ONE parquet file with ONE row group, and Spark
  cannot split a row group, so every scan (and its map-side work: partial
  aggregation, filters, projection) runs on one core regardless of split
  or partition settings.  Queries whose input feeds an explode/regex
  pipeline sidestep this via spread() (a cheap repartition of the small
  fixture, no-op at scale); scan+agg queries like a2/a4/q6 eat it — e.g.
  a2's 600 k-row scan+partial-agg is a fixed ~0.4 s single-core component
  that would parallelize over row groups on any real layout.
- Run-to-run noise at these sizes is ±15-25% per query (min-of-2 helps,
  stage scheduling at 32 threads over ~100 ms stages doesn't average out).
  d3's in-bench vs standalone delta (~0.2 s) is within this band —
  profiled fresh vs aged sessions show no systematic aging effect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline set: every major engine area — scan/filter, hash agg, distinct
#: agg, sort-merge join, multi-join TPC-H shapes, window, top-k, dedup
#: (exact + minhash), similarity, text stats, event rollup.
HEADLINE = [
    "flagship_join_topk",
    "s1_scan_filter",
    "q6_forecast_revenue",
    "a2_groupby_q1",
    "a4_count_distinct",
    "j3_sort_merge_join",
    "q3_shipping_priority",
    "q5_local_supplier",
    "w1_window_rank",
    "o3_topk",
    "d1_dedup_exact",
    "d3_minhash_lsh",
    "sim1_cosine_topk",
    "t1_text_stats",
    "st1_hourly_agg",
    "cp1_corpus_pipeline",
    "w2_window_lead_movavg",
    "ts1_gapfill",
    "st3_sliding_window",
    "arr1_posexplode",
    "sim2_embedding_near_dup",
    "t11_decontaminate",
    "t17_dup_spans",
    "cp2_curation_pipeline",
    "sim4_ivf_topk",
    "sim5_semdedup",
    "sim6_quantized_topk",
    "cp3_pretraining_ingest",
    # round 10 additions: the unigram-LM quality filter and its
    # gate-then-rebalance capstone
    "t19_perplexity_score",
    "cp5_perplexity_mix",
    # round 11: the bigram + trigram stupid-backoff tiers (held-out
    # train split)
    "t20_bigram_perplexity",
    "t21_trigram_perplexity",
    # round 12: the 4-gram and 5-gram tiers (order 5 IS the production
    # CCNet gate's order) and the snapshot-scored backoff LM (the
    # production fit-once/score-the-crawl shape)
    "t22_fourgram_perplexity",
    "t23_fivegram_perplexity",
    "t20s_lm_snapshot_backoff",
    # round 12 second wave: the incremental production regime end to
    # end (gopher gate → snapshot-LM band → snapshot dedup guard)
    "cp6_incremental_ingest",
    # round 12 third wave: DSIR data selection and the bloom-routed
    # admission guard
    "t26_dsir_select",
    "d8_bloom_guard",
]

#: Queries whose REAL cost partly runs at DataFrame-construction time
#: (sim4/sim5's deterministic-Lloyd quantizer collects centroid metadata
#: while the plan is being built).  For these the clock starts BEFORE
#: construction so the bench reports honest end-to-end cost instead of
#: hiding the quantizer outside the timed region.
CONSTRUCT_TIMED = {
    "sim4_ivf_topk",
    "sim5_semdedup",
    # t19/cp5/t20/t21/t22 localCheckpoint their count/gated tables at
    # build — the corpus-proportional pass must sit inside the clock;
    # t20s PERSISTS its snapshot at build (the amortized cost the probe
    # exists to measure)
    "t19_perplexity_score",
    "cp5_perplexity_mix",
    "t20_bigram_perplexity",
    "t21_trigram_perplexity",
    "t22_fourgram_perplexity",
    "t23_fivegram_perplexity",
    "t20s_lm_snapshot_backoff",
    # cp6 PERSISTS both reference snapshots at build — the amortized
    # once-per-snapshot cost belongs inside the clock
    "cp6_incremental_ingest",
    # t26 checkpoints the hashed-ngram counts table at build; d8
    # counts the reference + checkpoints the bloom bits map at build
    "t26_dsir_select",
    "d8_bloom_guard",
}


def main() -> None:
    import __spark_entry__ as entrymod
    from maple_spark.session import get_spark

    load_start = round(os.getloadavg()[0], 2)
    spark = get_spark(app_name="maple_spark_bench")
    qs = entrymod.queries()

    # warmup: JVM + codegen + parquet footer caches
    qs["s1_scan_filter"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # one untimed warmup run per query (plan compilation + whole-stage
    # codegen JIT — one-time costs that don't scale with data volume),
    # then min of 5 timed runs = steady-state execution cost (measured
    # run-to-run noise at these ~100 ms-stage sizes is ±25-50% under
    # transient host contention, and round-5 hosts showed sustained
    # background load that min-of-3 did not filter — unchanged queries
    # drifted 1.3-1.6× between runs; min-of-5 recovers the floor).
    #
    # During a query's runs every DataFrame is kept referenced: releasing
    # one lets the ContextCleaner unregister its SQL-metric accumulators,
    # and a straggler task-end event arriving after job completion then
    # logs a spurious "ERROR DAGScheduler: Failed to update accumulator"
    # — harmless but noisy.  BETWEEN queries the references are dropped
    # and both GCs forced (maple_spark.session.release_session_state,
    # the one definition shared with the scale sweeps):
    # broadcast relations otherwise accumulate on the driver across the
    # 27-query session (ContextCleaner frees them only after the
    # referencing DataFrames are GC'd — a 100× sweep OOM'd at query ~26
    # from exactly this), so late-sequence timings inherited whatever
    # the first 20 queries left resident while the bench makes 10%-level
    # cross-round claims.  The release runs OUTSIDE the timed region; by
    # then the query's jobs have completed, so the accumulator race is
    # closed.
    from maple_spark.session import release_session_state

    timings: dict[str, float] = {}
    for name in HEADLINE:
        keep_alive = []
        df = qs[name](spark, SF_DIR)
        keep_alive.append(df)
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            if name not in CONSTRUCT_TIMED:
                t0 = time.time()  # restart clock: construction untimed
            keep_alive.append(df)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        del keep_alive, df
        release_session_state(spark)

    total = round(sum(timings.values()), 3)
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None  # non-sf<N> dir: never discard the measured timings
    # Per-query drift vs the BEST prior round (committed BENCH_r*.json):
    # round-5 hosts showed sustained background load drifting unchanged
    # queries 1.3-1.6x between runs, so a single round-over-round delta
    # cannot distinguish a real regression from noise — the best prior
    # value is the steadiest available floor.  drift > 1.3 flags a query
    # for a closer look; it is a tripwire, not a verdict.
    best_prior: dict[str, float] = {}
    floor_src: dict[str, str] = {}  # query -> file that holds its floor
    all_loads: dict[str, float] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    import glob

    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if rec.get("rc") not in (0, None):
            continue  # a failed bench run is not a comparison floor
        prior = rec.get("parsed") or {}
        if prior.get("sf") != sf:
            continue  # only like-for-like scale factors compare
        base = os.path.basename(path)
        if isinstance(prior.get("load_avg_1m"), (int, float)):
            all_loads[base] = prior["load_avg_1m"]
        for q, t in (prior.get("queries") or {}).items():
            # only queries measured THIS run can flag drift, so only
            # their floors determine which prior loads are relevant
            if q in timings and isinstance(t, (int, float)) and t > 0:
                if q not in best_prior or t < best_prior[q]:
                    best_prior[q] = t
                    floor_src[q] = base
    drift = {
        q: round(t / best_prior[q], 2)
        for q, t in timings.items()
        if q in best_prior
    }
    # only loads from files that actually SET a comparison floor — a
    # prior run whose every time was beaten contributes no floor, so
    # its load cannot confound any drift flag (ADVICE r8)
    prior_loads = {
        base: all_loads[base]
        for base in sorted(set(floor_src.values()))
        if base in all_loads
    }
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "drift": drift,
                "drift_flags": sorted(q for q, r in drift.items() if r > 1.3),
                # host context for reading drift: sustained background
                # load on shared bench hosts moves unchanged queries
                # 1.3-2x between runs (documented rounds 5-6).  start/end
                # loads bracket THIS run; prior_loads_1m shows the load
                # under which each comparison floor was recorded, so a
                # drift flag on a high-load run vs a quiet-round floor
                # reads as the confound it is (round-7 static bisect:
                # every flagged query's code was byte-identical to the
                # prior round — load, not code, moved the numbers).
                "load_avg_1m": round(os.getloadavg()[0], 2),
                "load_avg_1m_start": load_start,
                "prior_loads_1m": prior_loads,
            }
        )
    )


if __name__ == "__main__":
    main()
