"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas over
mapInPandas.

The Spark-side plumbing — schemas, partition sizing, UDF signatures,
batch shapes — is real and tested. The actual media decode is STUBBED:
this container has no image/audio libraries, so ``_decode_image_real``
raises NotImplementedError and the pipeline runs a clearly-marked
deterministic fake (feature vector derived from the byte content's
hash) so every downstream stage (featurize → dedup → similarity) is
exercised end-to-end. Swapping in PIL/torchvision is a one-function
change.

Scale design: media bytes dominate row size, so operators here
(a) never shuffle the binary column — features are extracted first,
then the binary is dropped before any wide op; (b) run mapInPandas
with bounded Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch)
so a partition of large blobs can't OOM an executor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, feature array<float>"
)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap JVM-side metadata (no Python): byte length + placeholder
    mime sniff from magic bytes."""
    c = F.col(content_col)
    mime = (
        F.when(F.substring(c, 1, 3) == bytes([0xFF, 0xD8, 0xFF]), "image/jpeg")
        .when(F.substring(c, 1, 4) == b"\x89PNG", "image/png")
        .when(F.substring(c, 1, 4) == b"RIFF", "audio/wav")
        .otherwise("application/octet-stream")
    )
    return df.withColumn("n_bytes", F.length(c).cast("long")).withColumn(
        "sniffed_mime", mime
    )


def _decode_image_real(content: bytes) -> np.ndarray:
    """The real decode hook. STUB: no imaging libraries in this
    container — wire PIL.Image.open(BytesIO(content)) here."""
    raise NotImplementedError(
        "media decode requires an imaging library not present in this "
        "container; the pipeline uses the deterministic fake instead"
    )


def _decode_image_fake(content: bytes, dim: int) -> np.ndarray:
    """Deterministic fake decode: feature = normalized bytes of the
    content's sha256 stretched to `dim`. Keeps the full pipeline
    (decode → featurize → similarity) runnable and its outputs stable."""
    digest = hashlib.sha256(content).digest()
    raw = np.frombuffer((digest * (dim // len(digest) + 1))[:dim], dtype=np.uint8)
    return (raw.astype(np.float32) - 127.5) / 127.5


def decode_and_featurize(
    df: DataFrame, dim: int = 64, use_real_decoder: bool = False
) -> DataFrame:
    """mapInPandas decode+featurize: binary content → fixed-dim
    float feature vector + content hash. The binary column does NOT
    survive into the output — downstream shuffles move 64 floats, not
    megabytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, hashes, sizes = [], [], []
            for content in pdf["content"]:
                b = bytes(content) if content is not None else b""
                if use_real_decoder:
                    arr = _decode_image_real(b)  # pragma: no cover - stub
                else:
                    arr = _decode_image_fake(b, dim)
                feats.append(arr.tolist())
                hashes.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": sizes,
                    "sha256": hashes,
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Video frame-sampling plumbing: emit up to max_frames byte-offset
    "frames" per media row (flat_map shape: one output row per frame).
    The frame decode itself is the same stub boundary as images."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "offset": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = len(bytes(content)) if content is not None else 0
                for idx in range(min(max_frames, max(n // every_n_bytes, 1))):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["offset"].append(idx * every_n_bytes)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema="media_id long, frame_idx int, offset long")
