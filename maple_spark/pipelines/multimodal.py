"""Multimodal (image/audio/video) column handling.

Design: media lives as opaque ``binary`` cells alongside typed metadata
(modality, mime, width/height/duration), exactly how large training
pipelines store it (Parquet binary columns or pointer columns into a blob
store).  The Spark-side plumbing — schema, Arrow batching via
``mapInPandas``, partition sizing — is real and tested; the actual codecs
(PIL/ffmpeg/torchaudio) are NOT in this container, so the decode kernels
are stubbed: ``decode_stub=True`` computes deterministic fake features from
the bytes, and ``decode_stub=False`` raises ``NotImplementedError`` where
the real library call belongs.

Scale notes:
- media rows are fat → keep ``spark.sql.files.maxPartitionBytes`` modest so
  a partition of blobs fits executor memory; never ``collect`` blobs.
- feature extraction is a map-only pass (no shuffle); Arrow moves each
  batch to Python once — the right shape for a GPU/CPU decode stage.
- frame sampling multiplies rows; do it in the same ``mapInPandas`` pass so
  raw video bytes are never duplicated through a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-row schema: content + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("content", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feat_hash", LongType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents`` (the container
    has no real media): content = UTF-8 bytes of the text, modality round-
    robins image/audio/video.  Pure column expressions — this is the
    ingest-normalization step of a real pipeline (cast + rename + metadata),
    so its plan shape is identical with real blobs."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.concat(F.lit("x-fake/"), modality).alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        F.lit(None).cast("int").alias("meta_duration_ms"),
    )


def codecs_available() -> dict[str, bool]:
    """Which real media codecs import in THIS environment — the gate the
    real decode branch (and the ``codec``-marked tests) key off.  This
    container ships none of them; a CI host with PIL installed exercises
    the image branch end-to-end through the same Spark plumbing."""
    out = {}
    for modality, mod in (("image", "PIL"), ("audio", "soundfile"), ("video", "av")):
        try:
            __import__(mod)
            out[modality] = True
        except ImportError:
            out[modality] = False
    return out


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract pass over media rows via ``mapInPandas``.

    Arrow streams each partition to Python in batches; the UDF returns a
    *different* (narrow) schema — blobs go in, fixed-width features come
    out, so everything downstream shuffles cheaply.  Frame-sampling for
    video is computed here (n_frames) for the same reason.

    ``decode_stub=False`` runs the REAL decode per modality where the
    codec imports (PIL for image; audio/video codecs are not yet wired)
    and raises ``NotImplementedError`` where it doesn't — decoding must
    never silently fall back to the stub, because stub features are not
    comparable to decoded features.
    """

    # The kernel must be CLOSURE-ONLY (no maple_spark module globals):
    # cloudpickle serializes module-level helpers by module+name, and a
    # worker whose sys.path lacks the repo (vanilla driver session
    # started outside /root/repo) dies with ModuleNotFoundError — caught
    # by scripts/vanilla_gate.py.  Hence the local pandas import and the
    # nested helpers (fake_feature: sum of raw bytes, NULL → 0;
    # decode_image: PIL decode → sum of DECODED RGB bytes + n_frames,
    # so a corrupt blob fails at decode, not downstream).
    def kernel(batches):
        import pandas as _pd

        def fake_feature(b):
            return int(sum(b)) if b is not None else 0

        def decode_image(b):
            import io

            from PIL import Image

            with Image.open(io.BytesIO(b)) as im:
                rgb = im.convert("RGB")
                return int(sum(rgb.tobytes())), getattr(im, "n_frames", 1)

        def real(row_content, row_modality):
            if row_content is None:
                # nothing to decode: same zero-feature row as the stub
                # tier (a NULL blob must not fail the job in one tier
                # and pass in the other)
                return 0, 0
            if row_modality == "image":
                try:
                    return decode_image(row_content)
                except ImportError:
                    raise NotImplementedError(
                        "image codec (PIL) not available"
                    ) from None
            # soundfile.read / av.open belong here
            raise NotImplementedError(f"{row_modality} codec not available")

        for pdf in batches:
            content = pdf["content"]
            if not decode_stub:
                decoded = [
                    real(c, m)
                    for c, m in zip(content, pdf["modality"])
                ]
                yield _pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "modality": pdf["modality"],
                        "n_bytes": content.map(
                            lambda b: len(b) if b is not None else 0
                        ).astype("int64"),
                        "feat_hash": _pd.Series(
                            [f for f, _ in decoded], dtype="int64"
                        ),
                        "n_frames": _pd.Series(
                            [n for _, n in decoded], dtype="int32"
                        ),
                    }
                )
                continue
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "feat_hash": content.map(fake_feature).astype("int64"),
                    "n_frames": (
                        content.map(lambda b: (len(b) % 10) + 1 if b is not None else 0)
                    ).astype("int32"),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def extract_features_arrow(media: DataFrame) -> DataFrame:
    """``mapInArrow`` variant of :func:`extract_features`: the kernel sees
    raw Arrow RecordBatches — no Arrow→pandas conversion, no object-dtype
    copy of the blobs.  This is the batch shape a GPU decode stage wants
    (hand the Arrow buffers to DLPack/NVJPEG and emit fixed-width
    features); metadata columns stay zero-copy via pyarrow.compute."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            content = b.column(b.schema.get_field_index("content"))
            n_bytes = pc.coalesce(
                pc.binary_length(content).cast(pa.int64()), pa.scalar(0, pa.int64())
            )
            # the byte-sum stub stands in for the real decode; a production
            # kernel consumes content.buffers() directly (zero-copy)
            feat = pa.array(
                [int(sum(v.as_py())) if v.is_valid else 0 for v in content],
                pa.int64(),
            )
            # NULL content → 0 frames, matching the pandas kernel (the
            # coalesced n_bytes=0 would otherwise compute 0%10+1 = 1)
            n_frames = pc.if_else(
                content.is_valid(),
                pc.add(
                    pc.subtract(
                        n_bytes, pc.multiply(pc.divide(n_bytes, 10), 10)
                    ),
                    pa.scalar(1, pa.int64()),
                ),
                pa.scalar(0, pa.int64()),
            ).cast(pa.int32())
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("media_id")),
                    b.column(b.schema.get_field_index("modality")),
                    n_bytes,
                    feat,
                    n_frames,
                ],
                names=["media_id", "modality", "n_bytes", "feat_hash", "n_frames"],
            )

    return media.mapInArrow(kernel, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), True),
    ]
)


def sample_frames(
    media: DataFrame, every_nth: int = 2, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling for video rows: one input row → k output rows, done
    inside the same ``mapInPandas`` pass so raw video bytes are never
    duplicated through a shuffle (the row expansion happens post-decode,
    emitting only the sampled frames).

    The stub derives deterministic per-frame bytes (slices of the content)
    with the same fan-out arithmetic a real decoder would have; the real
    kernel replaces the slice with ``av.open(...)`` frame extraction.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for _, row in pdf.iterrows():
                if row["modality"] != "video":
                    continue
                content = row["content"] or b""
                if not decode_stub:
                    raise NotImplementedError("video codecs not available")
                n_frames = (len(content) % 10) + 1
                for fi in range(0, n_frames, every_nth):
                    lo = (fi * 7) % max(len(content), 1)
                    out_ids.append(row["media_id"])
                    out_idx.append(fi)
                    out_bytes.append(bytes(content[lo : lo + 16]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_bytes": pd.Series(out_bytes, dtype="object"),
                }
            )

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage (stub): real kernel would decode → resize →
    re-encode inside the same mapInPandas pass.  The stub records the target
    dims in metadata and passes bytes through unchanged, preserving the
    pipeline contract (schema in == schema out)."""
    return media.withColumn(
        "meta_width", F.when(F.col("modality") == "image", F.lit(width)).otherwise(F.col("meta_width"))
    ).withColumn(
        "meta_height", F.when(F.col("modality") == "image", F.lit(height)).otherwise(F.col("meta_height"))
    )
