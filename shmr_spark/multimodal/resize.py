"""Distributed image resize: decode (real PNG/JPEG codecs) →
nearest-neighbor resample → re-encode PNG, as an Arrow-batched
mapInPandas stage — the remaining multimodal primitive after decode /
featurize / frame-sample.

Nearest-neighbor with the floor mapping ``src = (dst · in) // out`` is
fully deterministic integer math (no resampling kernel, no float
rounding), so resized pixel statistics are closed-form computable for
structured inputs — which is how the driver gate oracles this without
an image library on the SQL side. Output re-encodes losslessly as PNG
regardless of input format (resized bytes are exact).

Per-row degradation: a row whose content can't be decoded (foreign
format, truncated) yields err != NULL with no content — the task and
batch always survive (same contract as decode_and_featurize).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _resize_nearest(px: np.ndarray, factor: float) -> np.ndarray:
    """(h, w, c) uint8 → nearest-neighbor resample by ``factor``
    (floor mapping; output dims floor(dim·factor), min 1).

    Output dims use exact rational arithmetic — ``factor`` is read as
    the nearest simple rational (Fraction.limit_denominator), so
    floor(90 · 0.7) = 63, not int(62.999…) = 62 as naive float
    multiply would give. Keeps the closed-form-oracle promise for any
    decimal factor, not just binary-exact ones."""
    from fractions import Fraction

    frac = Fraction(factor).limit_denominator(10**6)
    h, w = px.shape[0], px.shape[1]
    out_h = max(1, (h * frac.numerator) // frac.denominator)
    out_w = max(1, (w * frac.numerator) // frac.denominator)
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys[:, None], xs[None, :], :]


def resize_images(
    df: DataFrame,
    factor: float = 0.5,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, content) → (id, content: resized PNG bytes, width, height,
    px_sum, err). Binary in, binary out; the shuffle after this stage
    carries the RESIZED bytes (factor² smaller for downscales)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from shmr_spark.multimodal.binary import _decode_image_real
        from shmr_spark.multimodal.png import png_encode

        for pdf in it:
            ids, contents, widths, heights, sums, errs = [], [], [], [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                ids.append(mid)
                try:
                    px = _decode_image_real(bytes(content))
                    small = _resize_nearest(px, factor)
                    contents.append(png_encode(small))
                    heights.append(small.shape[0])
                    widths.append(small.shape[1])
                    sums.append(int(small.sum(dtype=np.int64)))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — per-row degrade
                    contents.append(None)
                    widths.append(0)
                    heights.append(0)
                    sums.append(-1)
                    errs.append(f"{type(e).__name__}: {e}"[:200])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "content": contents,
                    "width": widths,
                    "height": heights,
                    "px_sum": sums,
                    "err": errs,
                }
            )

    return df.mapInPandas(
        batches,
        schema=(
            f"{id_col} long, content binary, width int, height int, "
            "px_sum long, err string"
        ),
    )
