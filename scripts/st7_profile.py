"""Phase profile of st7 (streaming cross-corpus dedup) at sf0.1 and 100x.

The r6 100x run put st7 at 155 s — ~1.9x its batch twin d6 (84 s) —
with a suspected "payload tax": the stream side's fingerprint set
(`__nset`, ~8 B/shingle ~= the whole doc text) rides the x16 band
explode into the (band, bucket) bucket-join shuffle, so the join
exchanges ~16x the corpus's set payload.  This script splits the wall
into the operator's physical phases so the go/no-go on payload surgery
is a measurement, not a guess:

  A  stream banding WITHOUT the set payload (map-only, noop sink)
  A2 stream banding WITH __nset carried (the shipped plan's map work)
  B  reference prep (batch banding + per-ref fingerprint sets)
  C  bucket-join + candidate dropDuplicates (payload shuffles here)
  D  the full shipped operator (st7_cross_dedup_stream registry entry)

and times one SURGERY variant (C2/D2): join the buckets WITHOUT
__nset, collapse candidates, then re-attach the stream side's set by
joining back to the stream projection.  Value-identical in batch
(asserted at sf0.1); in pure streaming DSL the join-back is a
stream-stream self-join (needs watermarks), so shipping it would mean
a foreachBatch variant — only worth it if the payload share of D is
large.

Phase times print AS THEY COMPLETE (a killed run keeps its partials).
sf0.1 phases are min-of-3 after a warm run; x100 phases are single
timed runs (minutes-scale walls — scheduling noise is irrelevant, and
a warm pass would double a ~20 min experiment).

Usage: python scripts/st7_profile.py [x100_dir]   (default /tmp/maple_sfx100)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from maple_spark.pipelines import dedup

SF01 = "/root/testdata/sf0.1"


def timeit(df, runs: int, warm: bool) -> float:
    if warm:
        df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def split_docs(spark, sf_dir):
    from maple_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") % 2 == 1),
        d.where(F.col("doc_id") % 2 == 0),
    )


def build_phases(spark, sf_dir):
    new, ref = split_docs(spark, sf_dir)
    k, num_perm, bands, thr = 8, 64, 16, 0.2

    base = new.select(
        F.col("doc_id").alias("new_id"),
        dedup.fp_set_expr("text", k).alias("__nset"),
    )
    nb_light = dedup.lsh_band_buckets_rowlocal(
        base.select("new_id", "__nset"),
        "new_id",
        None,
        num_perm,
        bands,
        k,
        carry_cols=(),
        fp_set_col="__nset",
    )
    nb_full = dedup.lsh_band_buckets_rowlocal(
        base, "new_id", None, num_perm, bands, k,
        carry_cols=("__nset",), fp_set_col="__nset",
    )
    ref_buckets = dedup.lsh_band_buckets(
        ref, "doc_id", "text", num_perm, bands, k
    ).select(F.col("doc_id").alias("ref_id"), "band", "bucket")
    ref_sets = ref.select(
        F.col("doc_id").alias("ref_id"),
        dedup.fp_set_expr("text", k).alias("__rset"),
    )

    cand_shipped = (
        nb_full.join(ref_buckets, ["band", "bucket"])
        .select("new_id", "ref_id", "__nset")
        .dropDuplicates(["new_id", "ref_id"])
    )
    # surgery: shuffle buckets only; re-attach __nset post-collapse
    cand_light = (
        nb_light.join(ref_buckets, ["band", "bucket"])
        .select("new_id", "ref_id")
        .dropDuplicates(["new_id", "ref_id"])
        .join(base, "new_id")
    )

    def verify(cand):
        n_inter = F.size(F.array_intersect("__nset", "__rset"))
        return (
            cand.join(ref_sets, "ref_id")
            .withColumn(
                "jaccard",
                F.round(
                    n_inter / (F.size("__nset") + F.size("__rset") - n_inter),
                    6,
                ),
            )
            .where(F.col("jaccard") >= thr)
            .select("new_id", "ref_id", "jaccard")
        )

    full_shipped = dedup.cross_dedup_stream(
        new, ref, "doc_id", "text", num_perm=num_perm, bands=bands, k=k,
        jaccard_threshold=thr,
    )
    return {
        "A_banding_no_payload": nb_light,
        "A2_banding_with_set": nb_full,
        "B_ref_buckets": ref_buckets,
        "B2_ref_sets": ref_sets,
        "C_candidates_shipped": cand_shipped,
        "C2_candidates_surgery": cand_light,
        "D_full_shipped": full_shipped,
        "D2_full_surgery": verify(cand_light),
    }


def run(spark, sf_dir, label, runs, warm, check=False):
    dfs = build_phases(spark, sf_dir)
    if check:
        a = {tuple(r) for r in dfs["D_full_shipped"].collect()}
        b = {tuple(r) for r in dfs["D2_full_surgery"].collect()}
        assert a == b, f"surgery output differs: {len(a)} vs {len(b)} rows"
        print(f"{label}: surgery output identical ({len(a)} pairs)", flush=True)
    out = {}
    for name, df in dfs.items():
        out[name] = round(timeit(df, runs, warm), 3)
        print(f"{label} {name:24s} {out[name]:9.3f}s", flush=True)
    return out


def main() -> None:
    import os

    from maple_spark.session import get_spark

    x100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/maple_sfx100"
    spark = get_spark(app_name="st7_profile")
    res = {"sf0.1": run(spark, SF01, "sf0.1", runs=3, warm=True, check=True)}
    if os.path.exists(f"{x100}/documents.parquet"):
        res["x100"] = run(spark, x100, "x100", runs=1, warm=False)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
