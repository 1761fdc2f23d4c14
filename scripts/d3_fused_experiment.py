"""d3 stage-count surgery A/B (VERDICT r7 task 2, carried from r6 task 1).

Question: can d3 (minhash_lsh_pairs) hit the r4 "<=1.5 s at sf0.1" target
by collapsing verify stages — reusing the banding scan's per-doc
aggregation so verify_jaccard never re-shingles candidates?

The candidate surgery ("fused"): ONE groupBy(id) computes BOTH the 64
signature mins AND collect_set(fp60) for every document; banding explodes
from that aggregate, and the verifier joins the same aggregate's set
column back to the candidate pairs — AQE exchange reuse means the
signature shuffle is produced once and read three times (banding, sa,
sb).  This removes the verify path's semi-join + second md5 pass +
candidate collect_set shuffle entirely (~2-3 stages).

The scale trade-off this script measures the toy-scale side of: the fused
signature shuffle carries the FULL per-doc fingerprint set (~8 bytes per
distinct 8-char shingle ~= the text itself) for the WHOLE corpus, where
the split design's signature shuffle carries 64 fixed-width mins per doc
and only CANDIDATE docs (typically a few % of the corpus) ever ship their
sets.  At 100 TB that is a ~10-30x payload inflation of the largest
shuffle in exchange for fewer stages — stages are fixed overhead (~100 ms
each locally, amortized at scale), shuffle bytes are not.

Run: python scripts/d3_fused_experiment.py [sf_dir]
Outputs one JSON line with interleaved min-of-5 timings, phase splits,
equality check, and load_avg.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from maple_spark.functions import phash
from maple_spark.pipelines import dedup
from maple_spark.pipelines.util import spread as _spread
from maple_spark.session import get_spark


def minhash_lsh_pairs_fused(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 8,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Fused variant: signature mins + fp60 set in ONE per-doc groupBy."""
    rows_per_band = num_perm // bands
    consts = phash.perm_consts(num_perm)
    shingles = F.array_distinct(dedup.shingle_expr(text_col, k))
    sh = (
        _spread(df.select(id_col, text_col))
        .where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(shingles).alias("__s"))
        .select(F.col(id_col), phash.fp60(F.col("__s")).alias("__h"))
    )
    r = F.col("__h") % F.lit(phash.P31)
    per_doc = sh.groupBy(id_col).agg(
        F.collect_set("__h").alias("__set"),
        *[
            F.min((F.lit(a) * r + F.lit(b)) % F.lit(phash.P31)).alias(f"h{i}")
            for i, (a, b) in enumerate(consts)
        ],
    )
    stacked = per_doc.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    phash.poly_bucket(
                        [
                            F.col(f"h{b * rows_per_band + r0}")
                            for r0 in range(rows_per_band)
                        ]
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    candidates = (
        stacked.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) ->"
                    " transform(slice(ids, i + 2, size(ids)),"
                    " y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    sets = per_doc.select(id_col, "__set")
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("__set").alias("__sa"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("__set").alias("__sb"))
    n_inter = F.size(F.array_intersect("__sa", "__sb"))
    return (
        sa.join(candidates, on="id_a")
        .join(sb, on="id_b")
        .withColumn(
            "jaccard",
            F.round(n_inter / (F.size("__sa") + F.size("__sb") - n_inter), 6),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def timed_min5(build, warm=True):
    if warm:
        build().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(5):
        df = build()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="d3_fused_experiment")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    thr = 0.2

    split = lambda: dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", jaccard_threshold=thr
    )
    fused = lambda: minhash_lsh_pairs_fused(
        docs, "doc_id", "text", jaccard_threshold=thr
    )

    # equality first (cheap at any sf: output is the verified pair list)
    a = {tuple(r) for r in split().collect()}
    b = {tuple(r) for r in fused().collect()}
    equal = a == b

    # phase splits of the CURRENT design (what does each stage-group cost?)
    banding = lambda: dedup.lsh_band_buckets(docs, "doc_id", "text")

    def cands():
        stacked = dedup.lsh_band_buckets(docs, "doc_id", "text")
        return (
            stacked.groupBy("band", "bucket")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .where(F.size("ids") > 1)
            .select(
                F.explode(
                    F.expr(
                        "flatten(transform(ids, (x, i) ->"
                        " transform(slice(ids, i + 2, size(ids)),"
                        " y -> struct(x AS id_a, y AS id_b))))"
                    )
                ).alias("p")
            )
            .select("p.id_a", "p.id_b")
            .distinct()
        )

    # interleaved min-of-5: split, fused, split, fused ... per REP so host
    # drift hits both arms equally
    res = {}
    res["banding_only"] = timed_min5(banding)
    res["through_candidates"] = timed_min5(cands)
    t_split, t_fused = [], []
    for _ in range(5):
        for arm, out in (("split", t_split), ("fused", t_fused)):
            build = split if arm == "split" else fused
            df = build()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            out.append(time.time() - t0)
    res["split_min5"] = round(min(t_split), 3)
    res["fused_min5"] = round(min(t_fused), 3)
    res["split_all"] = [round(t, 3) for t in t_split]
    res["fused_all"] = [round(t, 3) for t in t_fused]
    res["equal_output"] = equal
    res["n_pairs"] = len(a)
    res["load_avg"] = os.getloadavg()
    res["sf_dir"] = sf
    print(json.dumps(res))


if __name__ == "__main__":
    main()
