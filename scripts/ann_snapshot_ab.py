"""Measure the ANN snapshot APIs' amortization (round 9).

Two searchers gained persisted-index forms this round; this measures
what each saves per query batch, interleaved in one session, END-TO-END
(construction included — that is where training/quantization costs
live, which is the entire point of the snapshots):

- sim4/IVF: inline ivf_topk re-trains the Lloyd quantizer (two
  assignment passes + two (cell,dim) aggs + centroid collects) every
  call; ivf_snapshot= loads assignments + centroids from parquet.
- sim6/quantized: inline quantized_topk re-quantizes the float corpus
  every call; quantized_snapshot= scans the persisted array<tinyint>
  table.

Usage: python scripts/ann_snapshot_ab.py [sf_dir or x100_dir]
One JSON line.  Equality of inline-vs-snapshot outputs is pytest-pinned
(test_ivf_snapshot_roundtrip / test_quantized_snapshot_roundtrip); this
script measures cost only.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from maple_spark.pipelines import similarity
    from maple_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="ann_snapshot_ab")
    load0 = round(os.getloadavg()[0], 2)
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 10)

    def end_to_end(build):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def min_of(n, build):
        return round(min(end_to_end(build) for _ in range(n)), 3)

    ivf_path = "/tmp/maple_ivf_snapshot"
    q8_path = "/tmp/maple_q8_snapshot"
    shutil.rmtree(ivf_path, ignore_errors=True)
    shutil.rmtree(q8_path, ignore_errors=True)
    t0 = time.time()
    similarity.build_ivf_snapshot(e, ivf_path)
    ivf_prep = round(time.time() - t0, 3)
    t0 = time.time()
    similarity.build_quantized_snapshot(e, q8_path)
    q8_prep = round(time.time() - t0, 3)

    # warm both plans of both searchers, then interleave
    for build in (
        lambda: similarity.ivf_topk(e, q, k=5),
        lambda: similarity.ivf_topk(e, q, k=5, ivf_snapshot=ivf_path),
        lambda: similarity.quantized_topk(e, q, k=5),
        lambda: similarity.quantized_topk(e, q, k=5, quantized_snapshot=q8_path),
    ):
        end_to_end(build)
    runs = 3
    out = {
        "sf_dir": sf,
        "ivf": {
            "prep_sec": ivf_prep,
            "inline_sec": min_of(runs, lambda: similarity.ivf_topk(e, q, k=5)),
            "snapshot_sec": min_of(
                runs,
                lambda: similarity.ivf_topk(e, q, k=5, ivf_snapshot=ivf_path),
            ),
        },
        "quantized": {
            "prep_sec": q8_prep,
            "inline_sec": min_of(
                runs, lambda: similarity.quantized_topk(e, q, k=5)
            ),
            "snapshot_sec": min_of(
                runs,
                lambda: similarity.quantized_topk(
                    e, q, k=5, quantized_snapshot=q8_path
                ),
            ),
        },
        "load_avg_1m_start": load0,
        "load_avg_1m_end": round(os.getloadavg()[0], 2),
    }
    for key in ("ivf", "quantized"):
        d = out[key]
        d["amortized_speedup"] = round(d["inline_sec"] / d["snapshot_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
