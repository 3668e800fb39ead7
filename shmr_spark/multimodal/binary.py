"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas over
mapInPandas.

The Spark-side plumbing — schemas, partition sizing, UDF signatures,
batch shapes — is real and tested. Decode status by format:

- PNG: REAL — dependency-free stdlib decoder (multimodal/png.py,
  8-bit gray/RGB/RGBA/palette, all five scanline filters);
  ``_decode_image_real`` returns actual pixels and the featurizer
  emits true width/height plus a pixel checksum.
- JPEG / audio / video: still stubbed (no codecs in this container) —
  ``_decode_image_real`` raises NotImplementedError for them and the
  pipeline can fall back to the clearly-marked deterministic fake
  (feature vector derived from the byte content's hash) so every
  downstream stage (featurize → dedup → similarity) is exercised
  end-to-end. Swapping in PIL/torchvision is a one-function change.

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
    "media_id long, n_bytes long, sha256 string, feature array<float>, "
    "width int, height int, px_sum long"
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


def _is_decodable(content: bytes) -> bool:
    """True when a real decoder exists for this blob (PNG or baseline
    JPEG)."""
    from shmr_spark.multimodal.jpeg import is_jpeg
    from shmr_spark.multimodal.png import is_png

    return is_png(content) or is_jpeg(content)


def _decode_image_real(content: bytes) -> np.ndarray:
    """The real decode hook: PNG and baseline JPEG decode for real via
    the stdlib codecs in multimodal/png.py and multimodal/jpeg.py;
    other formats (WebP, progressive JPEG, ...) still need an imaging
    library not present in this container."""
    from shmr_spark.multimodal.jpeg import is_jpeg, jpeg_decode
    from shmr_spark.multimodal.png import is_png, png_decode

    if is_png(content):
        pixels, _info = png_decode(content)
        return pixels
    if is_jpeg(content):
        pixels, _info = jpeg_decode(content)
        return pixels
    raise NotImplementedError(
        "media decode beyond PNG/baseline-JPEG requires an imaging "
        "library not present in this container; use the deterministic "
        "fake instead"
    )


def _featurize_pixels(pixels: np.ndarray, dim: int) -> np.ndarray:
    """Decoded pixels → fixed-dim feature: luminance flattened
    row-major, mean-pooled into `dim` bins, normalized to [-1, 1]."""
    gray = pixels.astype(np.float64).mean(axis=2).ravel()
    n = len(gray)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    idx = (np.arange(n) * dim) // max(n, 1)
    sums = np.bincount(idx, weights=gray, minlength=dim)
    counts = np.maximum(np.bincount(idx, minlength=dim), 1)
    return ((sums / counts - 127.5) / 127.5).astype(np.float32)


def _decode_image_fake(content: bytes, dim: int) -> np.ndarray:
    """Deterministic fake decode: feature = normalized bytes of the
    content's sha256 stretched to `dim`. Keeps the full pipeline
    (decode → featurize → similarity) runnable and its outputs stable."""
    digest = hashlib.sha256(content).digest()
    raw = np.frombuffer((digest * (dim // len(digest) + 1))[:dim], dtype=np.uint8)
    return (raw.astype(np.float32) - 127.5) / 127.5


def decode_and_featurize(
    df: DataFrame,
    dim: int = 64,
    use_real_decoder: bool = False,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """mapInPandas decode+featurize: binary content → fixed-dim float
    feature vector + content hash; with the real decoder, also true
    image width/height and a pixel checksum (sum of all channel
    bytes). The binary column does NOT survive into the output —
    downstream shuffles move 64 floats, not megabytes. ``passthrough``
    names input columns copied verbatim into the output (so callers
    can keep e.g. a source-document hash without re-joining against
    the heavy binary relation)."""
    extra = list(passthrough or [])
    in_schema = dict(zip(df.schema.names, df.schema.fields))
    extra_ddl = "".join(
        f", {c} {in_schema[c].dataType.simpleString()}" for c in extra
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, hashes, sizes = [], [], []
            widths, heights, sums = [], [], []
            for content in pdf["content"]:
                b = bytes(content) if content is not None else b""
                pixels = None
                if use_real_decoder and _is_decodable(b):
                    try:
                        pixels = _decode_image_real(b)
                    except Exception:
                        pixels = None  # truncated/progressive/corrupt
                if pixels is not None:
                    arr = _featurize_pixels(pixels, dim)
                    h, w, _nch = pixels.shape
                    widths.append(w)
                    heights.append(h)
                    sums.append(int(pixels.astype(np.int64).sum()))
                else:
                    # real-decoder mode degrades per-row for null/empty/
                    # non-decodable blobs (fake feature, null dims)
                    # instead of failing the whole task on one bad cell
                    arr = _decode_image_fake(b, dim)
                    widths.append(None)
                    heights.append(None)
                    sums.append(None)
                feats.append(arr.tolist())
                hashes.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": sizes,
                "sha256": hashes,
                "feature": feats,
                "width": pd.array(widths, dtype="Int32"),
                "height": pd.array(heights, dtype="Int32"),
                "px_sum": pd.array(sums, dtype="Int64"),
            }
            for c in extra:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA + extra_ddl)


AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, feature array<float>, "
    "sample_rate int, n_samples long, duration_ms long, sample_sum long"
)


def featurize_audio(
    df: DataFrame,
    dim: int = 16,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """mapInPandas WAV decode + featurize: PCM bytes → sample rate /
    frame count / duration plus a fixed-dim loudness-envelope feature
    (mean |amplitude| per time bin, normalized by the int16 range).
    Non-WAV/empty/null blobs degrade per-row to the deterministic fake
    feature with null audio fields — one bad blob never fails the
    task. Same 100 TB discipline as decode_and_featurize: the binary
    column dies here; only small features shuffle onward."""
    from shmr_spark.multimodal.wav import is_wav, wav_decode

    extra = list(passthrough or [])
    in_schema = dict(zip(df.schema.names, df.schema.fields))
    extra_ddl = "".join(
        f", {c} {in_schema[c].dataType.simpleString()}" for c in extra
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, hashes, sizes = [], [], []
            rates, counts, durs, sums = [], [], [], []
            for content in pdf["content"]:
                b = bytes(content) if content is not None else b""
                decoded = None
                if is_wav(b):
                    try:
                        decoded = wav_decode(b)
                    except Exception:
                        decoded = None  # truncated/non-PCM RIFF
                if decoded is not None:
                    samples, info = decoded
                    mono = samples.mean(axis=1)
                    n = len(mono)
                    rates.append(info["sample_rate"])
                    counts.append(n)
                    durs.append(n * 1000 // max(info["sample_rate"], 1))
                    sums.append(int(samples.sum()))
                    if n == 0:
                        arr = np.zeros(dim, dtype=np.float32)
                    else:
                        idx = (np.arange(n) * dim) // n
                        env = np.bincount(idx, weights=np.abs(mono), minlength=dim)
                        cnt = np.maximum(np.bincount(idx, minlength=dim), 1)
                        arr = (env / cnt / 32768.0).astype(np.float32)
                else:
                    rates.append(None)
                    counts.append(None)
                    durs.append(None)
                    sums.append(None)
                    arr = _decode_image_fake(b, dim)
                feats.append(arr.tolist())
                hashes.append(hashlib.sha256(b).hexdigest())
                sizes.append(len(b))
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": sizes,
                "sha256": hashes,
                "feature": feats,
                "sample_rate": pd.array(rates, dtype="Int32"),
                "n_samples": pd.array(counts, dtype="Int64"),
                "duration_ms": pd.array(durs, dtype="Int64"),
                "sample_sum": pd.array(sums, dtype="Int64"),
            }
            for c in extra:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA + extra_ddl)


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
