"""Dependency-free PNG codec (stdlib zlib + struct + numpy).

The reference engine has no multimodal surface at all (its records are
opaque JSON lines — /root/reference/shmr/partition.py:16-17); media
columns are part of this repo's LLM-pipeline extension set. This
module makes the image-decode hook REAL for PNG without any imaging
library: a full decoder for 8-bit non-interlaced PNGs (color types
0 gray / 2 RGB / 3 palette / 4 gray+alpha / 6 RGBA, all five scanline
filters) and a matching encoder used by tests and queries to plant
deterministic images.

Scale note: the codec runs inside Arrow-batched ``mapInPandas``
workers (multimodal/binary.py), one image at a time, bounded by
``arrow.maxRecordsPerBatch`` — it never touches the driver and the
decoded pixels never enter a shuffle (features are extracted first).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per pixel, by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _MAGIC


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode an 8-bit non-interlaced PNG → (H, W, C) uint8 array plus
    an info dict {width, height, color_type, channels}. Palette images
    are expanded to RGB."""
    if not is_png(data):
        raise ValueError("not a PNG (bad magic)")
    width = height = None
    color_type = bit_depth = None
    palette: np.ndarray | None = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise NotImplementedError(f"bit depth {bit_depth} unsupported (8 only)")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG unsupported")
            if color_type not in _CHANNELS:
                raise ValueError(f"bad color type {color_type}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("missing IHDR")
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int32
        )
        if ftype == 0:
            recon = line
        elif ftype == 1:
            # Sub is a per-channel prefix sum mod 256 — vectorized
            # (recon[i] = line[i] + recon[i-nch] unrolls to a cumsum)
            recon = (np.cumsum(line.reshape(width, nch), axis=0) & 0xFF).reshape(
                stride
            )
        elif ftype == 2:  # Up — vectorized
            recon = (line + prior) & 0xFF
        else:  # Average / Paeth are inherently sequential in-row
            recon = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = recon[i - nch] if i >= nch else 0
                if ftype == 3:
                    recon[i] = (line[i] + ((a + prior[i]) >> 1)) & 0xFF
                elif ftype == 4:
                    c = prior[i - nch] if i >= nch else 0
                    recon[i] = (line[i] + _paeth(int(a), int(prior[i]), int(c))) & 0xFF
                else:
                    raise ValueError(f"bad filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prior = recon

    pixels = out.reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        pixels = palette[pixels[:, :, 0]]
        nch = 3
    info = {
        "width": width,
        "height": height,
        "color_type": color_type,
        "channels": nch,
    }
    return pixels, info


def _filter_row(
    ftype: int, row: np.ndarray, prior: np.ndarray, bpp: int
) -> np.ndarray:
    r = row.astype(np.int32)
    p = prior.astype(np.int32)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    upleft = np.zeros_like(p)
    upleft[bpp:] = p[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - p
    elif ftype == 3:
        out = r - ((left + p) >> 1)
    elif ftype == 4:
        pred = np.empty_like(r)
        for i in range(len(r)):
            pred[i] = _paeth(int(left[i]), int(p[i]), int(upleft[i]))
        out = r - pred
    else:
        raise ValueError(f"bad filter type {ftype}")
    return (out & 0xFF).astype(np.uint8)


def png_encode(pixels: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """Encode a (H, W) or (H, W, C) uint8 array (C in 1/2/3/4) as an
    8-bit PNG. ``filter_mode``: "none" writes filter 0 everywhere;
    "cycle" uses filter ``y % 5`` per row so a round-trip exercises
    every unfilter path in the decoder."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = arr.reshape(h, w * nch)
    body = bytearray()
    prior = np.zeros(w * nch, dtype=np.uint8)
    for y in range(h):
        ftype = 0 if filter_mode == "none" else y % 5
        body.append(ftype)
        body.extend(_filter_row(ftype, flat[y], prior, nch).tobytes())
        prior = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + chunk(b"IEND", b"")
    )
