"""Batch embedding inference plumbing (model stubbed, pipeline real).

The GPU-inference shape for corpus embedding: texts stream through
``mapInPandas`` in Arrow batches, each batch is encoded as one tensor
call, and rows come back with a fixed-width ``array<float>`` column.
The container has no model runtime, so the encoder is a deterministic
fake (md5-seeded unit vector per text) — swap ``_encode_batch`` for a
real model and nothing else changes: schema, batching, partitioning,
and downstream ANN (``pipelines.similarity``) are identical.

Scale notes: one Python worker per partition, one encoder call per Arrow
batch (``spark.sql.execution.arrow.maxRecordsPerBatch`` is the batch-size
knob ≈ GPU batch size); embeddings are fixed-width so everything
downstream shuffles signatures, not text.  Partition count should match
accelerator count on a real cluster — repartition upstream, not here.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _encode_batch(texts: pd.Series, dim: int) -> np.ndarray:
    """Deterministic stand-in for model.encode(batch): md5-seeded
    pseudo-random unit vector per text.  Replace with a real encoder —
    the (n_rows, dim) float32 contract is what matters."""
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if t is None:  # NULL text (sparse jsonl ingest): embed as empty
            t = ""
        seed = int.from_bytes(
            hashlib.md5(t.encode("utf-8", "surrogatepass")).digest()[:8], "big"
        )
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim).astype(np.float32)
        out[i] = v / (np.linalg.norm(v) or 1.0)
    return out


def embed_texts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", dim: int = 16
) -> DataFrame:
    """(id, embedding array<float>) via Arrow-batched fake inference.

    The worker closure rebinds :func:`_encode_batch`'s logic LOCALLY
    (no maple_spark module reference in the UDF body): cloudpickle
    serializes module-level helpers by module+name, and a worker whose
    sys.path lacks the repo (vanilla driver session started outside
    /root/repo) dies with ModuleNotFoundError — scripts/vanilla_gate.py
    is the tripwire."""
    schema = f"{id_col} long, embedding array<float>"

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        def encode_batch(texts):
            out = _np.empty((len(texts), dim), dtype=_np.float32)
            for i, t in enumerate(texts):
                if t is None:
                    t = ""
                seed = int.from_bytes(
                    _hashlib.md5(
                        t.encode("utf-8", "surrogatepass")
                    ).digest()[:8],
                    "big",
                )
                rng = _np.random.default_rng(seed)
                v = rng.standard_normal(dim).astype(_np.float32)
                out[i] = v / (_np.linalg.norm(v) or 1.0)
            return out

        for pdf in batches:
            vecs = encode_batch(pdf[text_col])
            yield _pd.DataFrame(
                {id_col: pdf[id_col].values, "embedding": list(map(list, vecs))}
            )

    return df.select(id_col, text_col).mapInPandas(infer, schema=schema)
