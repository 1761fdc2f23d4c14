"""mm1 feature-extraction kernel A/B at fixture and 100x scale.

The multimodal family was rotated into the driver window in round 9 but
had no at-scale measurement.  mm1's decode pass moves every content blob
into Python; there are two kernels, equality-tested value-identical
(tests/test_pipelines.py::test_multimodal_arrow_kernel_matches_pandas):

- ``extract_features`` (mapInPandas): Arrow -> pandas conversion copies
  each blob into an object-dtype cell before the kernel sees it;
- ``extract_features_arrow`` (mapInArrow): the kernel reads the raw
  Arrow RecordBatch — no pandas materialization of the blobs (the shape
  a GPU decode stage wants: hand buffers to the device, emit features).

This measures both, interleaved min-of-N in ONE session (the only
meaningful comparison at 100x given the documented same-code spread),
at sf0.1 and at the 100x corpus, to decide whether extract_features
should size-route to the Arrow kernel like the gram/banding/repetition
kernels do.

Usage: python scripts/mm_kernel_ab.py [x100_dir]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def min_of(n, build):
    best = float("inf")
    for _ in range(n):
        df = build()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    from maple_spark.pipelines import multimodal
    from maple_spark.session import get_spark

    x100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/maple_sfx100"
    spark = get_spark(app_name="mm_kernel_ab")
    load0 = round(os.getloadavg()[0], 2)

    def media(sf_dir):
        return multimodal.documents_as_media(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        )

    out = {"load_avg_1m_start": load0}
    for label, sf_dir, runs in (("sf0.1", SRC, 5), ("x100", x100, 2)):
        if not os.path.exists(f"{sf_dir}/documents.parquet"):
            out[label] = "corpus absent"
            continue
        # warm both plans
        multimodal.extract_features(media(sf_dir)).write.format("noop").mode(
            "overwrite"
        ).save()
        multimodal.extract_features_arrow(media(sf_dir)).write.format(
            "noop"
        ).mode("overwrite").save()
        pandas_s = min_of(
            runs, lambda: multimodal.extract_features(media(sf_dir))
        )
        arrow_s = min_of(
            runs, lambda: multimodal.extract_features_arrow(media(sf_dir))
        )
        # second interleave round so a host-load phase can't fake a win
        pandas_s = min(
            pandas_s,
            min_of(runs, lambda: multimodal.extract_features(media(sf_dir))),
        )
        arrow_s = min(
            arrow_s,
            min_of(
                runs, lambda: multimodal.extract_features_arrow(media(sf_dir))
            ),
        )
        out[label] = {
            "mapInPandas_sec": pandas_s,
            "mapInArrow_sec": arrow_s,
            "arrow_over_pandas": round(arrow_s / pandas_s, 3),
        }
    out["load_avg_1m_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
