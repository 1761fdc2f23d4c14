"""Measure the reference-snapshot amortization at 100x (VERDICT r8 task 5).

SCALE.md has argued since round 6 that the stream guard's dominant fixed
cost — deriving the reference corpus's bucket + fingerprint-set tables,
~55 s of the 100x st7 wall — amortizes across ingest increments because
"reference tables are computed once per snapshot and persisted".  Round 9
added the API that makes that executable (dedup.build_reference_snapshot /
cross_dedup_stream(reference_snapshot=...)); this script measures the
claim in the PRODUCTION shape the operator advertises: a small statable
ingest batch (sf0.1 documents, ~600 KB) guarded against the 100x corpus
(~1.5 GB parquet, ~2.4x text per doc).

Three numbers, interleaved in one session (the only comparison that means
anything at 100x given the measured 1.5-2.7x same-code session spread):

- prep_sec: one-time build_reference_snapshot wall (amortized across all
  increments of a snapshot's lifetime);
- inline_sec: per-increment wall when the guard derives the reference
  tables in-query (prep paid EVERY increment — the pre-API cost);
- snapshot_sec: per-increment wall reading the persisted tables (prep
  excluded — the amortized cost).

The inline pass also exercises the round-9 routing fix end-to-end at
scale: small statable new_docs x big ref must put the EXPRESSION tier on
the ref side (honest stats; the kernel there would statically broadcast
a corpus-sized UDF table — the r8 regression this round reverted).

Output equality between the two paths is asserted on the collected pair
sets before any timing is reported.

Usage: python scripts/snapshot_amortization.py [x100_dir] [snapshot_dir]
Writes one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


from maple_spark.session import release_session_state as release  # noqa: E402


def main() -> None:
    from maple_spark.pipelines import dedup
    from maple_spark.session import get_spark

    x100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/maple_sfx100"
    snap = sys.argv[2] if len(sys.argv) > 2 else "/tmp/maple_ref_snapshot"
    spark = get_spark(app_name="snapshot_amortization")
    load0 = round(os.getloadavg()[0], 2)

    # The increment is a ~5k-doc SLICE of the reference corpus written
    # out as its own small parquet (the realistic arriving-batch shape:
    # small, statable, a separate file) — sliced from the corpus rather
    # than taken from sf0.1 so matches are GUARANTEED (every increment
    # doc at least matches itself in the reference; the x100 builder
    # copy-salts text, so sf0.1 originals match nothing and the
    # equality assertion would compare two empty sets).
    ref = spark.read.parquet(f"{x100}/documents.parquet")
    # ALWAYS rewritten (cheap, ~5k rows): a stale increment from a
    # previously-built corpus would match nothing and silently degrade
    # the benchmark to a zero-candidate workload
    inc_path = "/tmp/maple_increment.parquet"
    ref.where("doc_id % 100 = 1").coalesce(1).write.mode("overwrite").parquet(
        inc_path
    )
    new = spark.read.parquet(inc_path)

    shutil.rmtree(snap, ignore_errors=True)
    t0 = time.time()
    dedup.build_reference_snapshot(ref, snap, "doc_id", "text")
    prep_sec = time.time() - t0
    release(spark)

    def inline():
        return dedup.cross_dedup_stream(
            new, ref, "doc_id", "text", jaccard_threshold=0.2
        )

    def from_snap():
        return dedup.cross_dedup_stream(
            new, None, "doc_id", "text",
            jaccard_threshold=0.2, reference_snapshot=snap,
        )

    # output equality first (collected pair sets), then interleaved timing
    a = sorted(map(tuple, inline().collect()))
    b = sorted(map(tuple, from_snap().collect()))
    assert a == b, f"snapshot path diverges: {len(a)} vs {len(b)} pairs"
    assert a, "zero match pairs: the timing below would measure a degenerate no-candidate workload"
    release(spark)

    inline_secs, snap_secs = [], []
    for _ in range(2):
        inline_secs.append(round(noop(inline()), 2))
        release(spark)
        snap_secs.append(round(noop(from_snap()), 2))
        release(spark)

    print(
        json.dumps(
            {
                "x100_dir": x100,
                "increment_rows": new.count(),
                "reference_rows": ref.count(),
                "n_match_pairs": len(a),
                "prep_sec": round(prep_sec, 2),
                "inline_sec": inline_secs,
                "snapshot_sec": snap_secs,
                "amortized_speedup": round(
                    min(inline_secs) / min(snap_secs), 2
                ),
                "load_avg_1m_start": load0,
                "load_avg_1m_end": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
