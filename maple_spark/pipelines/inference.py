"""Batch embedding inference plumbing (model stubbed, pipeline real).

The GPU-inference shape for corpus embedding: texts stream through
``mapInPandas`` in Arrow batches, each batch is encoded as one tensor
call, and rows come back with a fixed-width ``array<float>`` column.
The container has no model runtime, so the default encoder is a
deterministic fake (md5-seeded unit vector per text) — pass a real
``encoder`` callable to :func:`embed_texts` and nothing else changes:
schema, batching, partitioning, and downstream ANN
(``pipelines.similarity``) are identical.

Scale notes: one Python worker per partition, one encoder call per Arrow
batch (``spark.sql.execution.arrow.maxRecordsPerBatch`` is the batch-size
knob ≈ GPU batch size); embeddings are fixed-width so everything
downstream shuffles signatures, not text.  Partition count should match
accelerator count on a real cluster — repartition upstream, not here.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


def embed_texts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 16,
    encoder: Callable | None = None,
) -> DataFrame:
    """(id, embedding array<float>) via Arrow-batched inference.

    ``encoder`` is the model seam: a callable ``(texts: pd.Series) ->
    (n_rows, dim) float32 ndarray`` — e.g. a SentenceTransformer's
    ``encode`` wrapped to fix the width.  It is captured into the worker
    closure, so it must be importable (or pickle-by-value) on workers —
    the standard pyspark contract for user code.  ``None`` uses the
    deterministic built-in fake (md5-seeded unit vector per text),
    defined INSIDE the closure: cloudpickle serializes module-level
    helpers by module+name, and a worker whose sys.path lacks the repo
    (vanilla driver session started outside /root/repo) dies with
    ModuleNotFoundError — scripts/vanilla_gate.py is the tripwire."""
    schema = f"{id_col} long, embedding array<float>"

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        def fake_encode(texts):
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

        encode = encoder if encoder is not None else fake_encode
        for pdf in batches:
            vecs = encode(pdf[text_col])
            yield _pd.DataFrame(
                {id_col: pdf[id_col].values, "embedding": list(map(list, vecs))}
            )

    return df.select(id_col, text_col).mapInPandas(infer, schema=schema)
