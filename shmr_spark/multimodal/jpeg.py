"""Dependency-free baseline JPEG (JFIF) codec — numpy + stdlib only.

Closes the JPEG leg of the multimodal brief with a REAL decoder (the
third real format after PNG and WAV): marker parsing (SOI/APPn/DQT/
DHT/SOF0/DRI/SOS/EOI), canonical Huffman decoding with byte-stuffing
and restart markers, zigzag + dequantization, exact separable float
IDCT, chroma upsampling (4:4:4 / 4:2:2 / 4:2:0), and YCbCr→RGB.
Supported: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components.
Progressive (SOF2) and arithmetic coding raise NotImplementedError —
the same documented boundary style as compressed audio.

The encoder emits spec-conformant baseline JPEGs (grayscale or 4:4:4
color) with caller-controllable quantization tables. Two properties
make it testable without any reference codec in the container:

- quant=1 everywhere → the only loss is DCT float rounding; a decode
  of our own encode is within ±2 of the source (asserted in tests);
- images whose 8×8 blocks are each SOLID gray decode BIT-EXACTLY
  (every AC coefficient is exactly 0; the DC path is integer-exact at
  quant 1), which is what lets the driver gate hash-check a closed-
  form pixel sum over real entropy-coded bytes
  (multimodal_jpeg_featurize in queries/advanced.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K standard Huffman tables: (bits[1..16], huffval)
_STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_STD_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Orthonormal 8-point DCT-II matrix; IDCT = C.T @ block @ C is exact
# to float64 round-off (the decoder then rounds to nearest int).
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(0.125 if _k == 0 else 0.25)
                      * np.cos((2 * _n + 1) * _k * np.pi / 16.0))


def is_jpeg(content: bytes) -> bool:
    return len(content) >= 3 and content[:3] == b"\xff\xd8\xff"


# ---------------------------------------------------------------- huffman


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code) -> symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol -> (code, length)}."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_decode_table(bits, huffval).items()
    }


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at any real marker and exposes it."""

    # Synthesized-padding budget once a marker is reached: the final
    # MCU legitimately needs a few pad bytes only because _fill tops
    # the buffer eagerly (≤4 bytes per fill). A stream that ends
    # prematurely (e.g. early EOI with MCUs remaining) keeps asking
    # for more — past this bound it is corrupt, not padded.
    _MAX_PAD_BYTES = 8

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None
        self.padded = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None:
                if self.padded >= self._MAX_PAD_BYTES:
                    raise ValueError(
                        "JPEG entropy stream ended prematurely "
                        f"(marker 0x{self.marker:02X} reached mid-scan)"
                    )
                self.padded += 1
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.bitbuf >> self.nbits) & ((1 << n) - 1)

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def reset_at_restart(self):
        """Consume an RSTn marker and realign to the byte boundary."""
        # drop any buffered bits (they are pad bits before the marker)
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet reached through the bit buffer; scan forward
            while True:
                if self.pos + 1 >= len(self.data):
                    raise ValueError("truncated JPEG: restart marker missing")
                b = self.data[self.pos]
                if b == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                    break
                self.pos += 1
        self.pos = self.data.index(b"\xff", self.pos)
        self.pos += 2  # past FF Dn
        self.marker = None
        self.padded = 0


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t-bit magnitude v to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------- decoder


def jpeg_decode(content: bytes) -> tuple[np.ndarray, dict]:
    """Decode baseline JPEG bytes → (pixels, info).

    pixels: uint8 (h, w, 1) grayscale or (h, w, 3) RGB.
    info: width, height, n_components, subsampling (h×v per comp).
    """
    if not is_jpeg(content):
        raise ValueError("not a JPEG (SOI missing)")
    data = content
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0

    while True:
        if pos + 3 >= len(data):
            raise ValueError("truncated JPEG (no SOS before end of data)")
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # spec B.1.1.2: any number of 0xFF fill bytes may precede the
        # marker code byte — skip them so FF FF ... FF <code> parses
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (fill bytes run to end of data)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                p += 1
                bits = list(seg[p:p + 16])
                p += 16
                n = sum(bits)
                vals = list(seg[p:p + n])
                p += n
                tbl = _build_decode_table(bits, vals)
                (huff_dc if cls == 0 else huff_ac)[tid] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            if ns != len(frame["comps"]) and len(frame["comps"]) > 1:
                # spec-legal but rare: a multi-component frame split
                # into separate per-component scans. Raising (instead
                # of decoding the first scan as the whole image) keeps
                # the caller's degrade-per-row contract honest.
                raise NotImplementedError(
                    "non-interleaved multi-scan baseline JPEG unsupported "
                    "(one interleaved SOS covering all components expected)"
                )
            scan = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append(
                    {"comp": comp, "dc": td_ta >> 4, "ac": td_ta & 0xF}
                )
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval
            )
        # else: APPn/COM — skip
        pos += seglen


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    w, h = frame["w"], frame["h"]
    if len(scan) == 1:
        # non-interleaved scan (spec B.2.3): the MCU is ONE data unit
        # and the component's SOF sampling factors do not shape the
        # block raster — e.g. grayscale files that declare 2x2 luma
        # factors still lay blocks out in plain row-major order
        scan = [dict(scan[0], comp=dict(scan[0]["comp"], h=1, v=1))]
    comps = [s["comp"] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.reset_at_restart()
                pred = [0] * len(comps)
            for ci, s in enumerate(scan):
                c = s["comp"]
                q = qt[c["tq"]]
                dctab, actab = huff_dc[s["dc"]], huff_ac[s["ac"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = reader.decode_symbol(dctab)
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(actab)
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        px = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        y0, x0 = (my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    out_planes = []
    for c, plane in zip(comps, planes):
        # upsample to full resolution, then crop
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out_planes.append(plane[:h, :w])

    info = {
        "width": w,
        "height": h,
        "n_components": len(comps),
        "subsampling": [(c["h"], c["v"]) for c in comps],
    }
    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None], info
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(p), 0, 255).astype(np.uint8) for p in (r, g, b)], axis=2
    )
    return rgb, info


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def pad_to_byte(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _encode_block(bw, block, q, dc_tab, ac_tab, pred):
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    # natural order -> zigzag order, then quantize (q is zigzag order)
    zz = np.rint(coef.flatten()[ZIGZAG] / q.astype(np.float64)).astype(np.int32)
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff != 0 else 0
    code, length = dc_tab[t]
    bw.write(code, length)
    if t:
        mag = diff if diff > 0 else diff + (1 << t) - 1
        bw.write(mag, t)
    # AC: run-length of zeros
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tab[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size = abs(v).bit_length()
        c, ln = ac_tab[(run << 4) | size]
        bw.write(c, ln)
        mag = v if v > 0 else v + (1 << size) - 1
        bw.write(mag, size)
        run = 0
    if run:
        c, ln = ac_tab[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def _dht_segment(cls: int, tid: int, table) -> bytes:
    bits, vals = table
    body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def jpeg_encode(
    pixels: np.ndarray,
    quant: int | np.ndarray = 1,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 pixels → baseline JFIF bytes.

    pixels: (h, w) or (h, w, 1) grayscale, or (h, w, 3) RGB.
    quant: scalar or 64-entry zigzag-order quantization table
    (1 = near-lossless: only DCT float rounding, and BIT-EXACT for
    blocks that are solid gray). subsampling: luma (h, v) factors —
    (1, 1) = 4:4:4, (2, 1) = 4:2:2, (2, 2) = 4:2:0 (chroma averaged
    per factor cell; color only). restart_interval > 0 emits DRI +
    RSTn markers every N MCUs (DC predictors reset). Dimensions are
    padded to MCU multiples by edge replication."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    if nch not in (1, 3):
        raise ValueError("1 or 3 channels")
    sh, sv = subsampling
    if nch == 1:
        sh = sv = 1  # single component: no interleave
    q = (np.full(64, quant, dtype=np.int32)
         if np.isscalar(quant) else np.asarray(quant, dtype=np.int32))
    # pad to MCU multiples (edge replication keeps blocks smooth)
    mcu_h, mcu_w = 8 * sv, 8 * sh
    ph = (h + mcu_h - 1) // mcu_h * mcu_h
    pw = (w + mcu_w - 1) // mcu_w * mcu_w
    arr = np.pad(arr, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")

    if nch == 3:
        rgbf = arr.astype(np.float64)
        r, g, b = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if (sh, sv) != (1, 1):
            # chroma downsample: mean over each sh×sv cell
            def down(p):
                return p.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))

            cb, cr = down(cb), down(cr)
        planes = [np.clip(np.rint(p), 0, 255) for p in (y, cb, cr)]
        samp = [(sh, sv), (1, 1), (1, 1)]
    else:
        planes = [arr[..., 0].astype(np.float64)]
        samp = [(1, 1)]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HH", 1, 1) + b"\x00\x00")
    # DQT (table 0, 8-bit, zigzag order)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(x) for x in q
    )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOF0
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i in range(ncomp):
        ch, cv = samp[i]
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: luminance tables for comp 0, chroma tables for comps 1,2
    out += _dht_segment(0, 0, _STD_DC_LUM) + _dht_segment(1, 0, _STD_AC_LUM)
    if ncomp == 3:
        out += _dht_segment(0, 1, _STD_DC_CHR) + _dht_segment(1, 1, _STD_AC_CHR)
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_lum = _build_encode_table(*_STD_DC_LUM)
    ac_lum = _build_encode_table(*_STD_AC_LUM)
    dc_chr = _build_encode_table(*_STD_DC_CHR)
    ac_chr = _build_encode_table(*_STD_AC_CHR)
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(ph // mcu_h):
        for mx in range(pw // mcu_w):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.pad_to_byte()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci, plane in enumerate(planes):
                ch, cv = samp[ci]
                dc_t = dc_lum if ci == 0 else dc_chr
                ac_t = ac_lum if ci == 0 else ac_chr
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = plane[y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, q, dc_t, ac_t, preds[ci]
                        )
            mcu_count += 1
    bw.pad_to_byte()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
