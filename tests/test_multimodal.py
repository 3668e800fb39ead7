"""Multimodal plumbing tests: binary columns + metadata + Arrow-batched
decode/featurize/frame-sample (decode itself is a documented stub)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shmr_spark.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_and_featurize,
    sample_frames,
)
from shmr_spark.multimodal.binary import _decode_image_real


@pytest.fixture()
def media_df(spark):
    rows = [
        (0, bytes([0xFF, 0xD8, 0xFF]) + b"jpegpayload" * 200, ("image/jpeg", 64, 64, None)),
        (1, b"\x89PNG\r\n" + b"pngpayload" * 300, ("image/png", 32, 32, None)),
        (2, b"RIFF" + b"wavpayload" * 500, ("audio/wav", None, None, 4000)),
        (3, None, (None, None, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_sniff(spark, media_df):
    out = {r.media_id: r.sniffed_mime for r in attach_media_metadata(media_df).collect()}
    assert out[0] == "image/jpeg"
    assert out[1] == "image/png"
    assert out[2] == "audio/wav"


def test_decode_and_featurize_shapes(spark, media_df):
    feats = decode_and_featurize(media_df, dim=64)
    rows = feats.collect()
    assert feats.columns == [
        "media_id", "n_bytes", "sha256", "feature", "width", "height", "px_sum",
    ]
    assert len(rows) == 4
    for r in rows:
        assert len(r.feature) == 64
        assert all(-1.0 <= x <= 1.0 for x in r.feature)
    # deterministic: same content → same feature
    again = {r.media_id: r.feature for r in decode_and_featurize(media_df, dim=64).collect()}
    assert {r.media_id: r.feature for r in rows} == again
    # binary column must NOT survive into the feature output
    assert "content" not in feats.columns


def test_real_decoder_png_jpeg_and_stub_boundary():
    """PNG and baseline JPEG decode for real; formats without a codec
    (e.g. WebP) remain the documented NotImplementedError boundary."""
    import numpy as np

    from shmr_spark.multimodal.jpeg import jpeg_encode
    from shmr_spark.multimodal.png import png_encode

    arr = np.arange(60, dtype=np.uint8).reshape(6, 10)
    pixels = _decode_image_real(png_encode(arr))
    assert pixels.shape == (6, 10, 1)
    assert (pixels[:, :, 0] == arr).all()

    solid = np.full((8, 8), 99, dtype=np.uint8)
    jp = _decode_image_real(jpeg_encode(solid, quant=1))
    assert (jp[:, :, 0] == solid).all()

    with pytest.raises(NotImplementedError):
        _decode_image_real(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_png_codec_roundtrip_all_types():
    """Encoder/decoder round-trip over every supported color type and
    both filter modes (cycle mode hits all five PNG filter types)."""
    import numpy as np

    from shmr_spark.multimodal.png import png_decode, png_encode

    rng = np.random.RandomState(11)
    for shape in [(1, 1), (17, 23), (8, 5, 2), (9, 31, 3), (12, 7, 4)]:
        arr = rng.randint(0, 256, size=shape, dtype=np.uint8)
        want = arr[:, :, None] if arr.ndim == 2 else arr
        for mode in ("none", "cycle"):
            got, info = png_decode(png_encode(arr, filter_mode=mode))
            assert got.shape == want.shape
            assert (got == want).all()
            assert info["width"] == want.shape[1]
            assert info["height"] == want.shape[0]


def test_png_palette_decode():
    """Hand-built palette (color type 3) PNG expands to RGB."""
    import struct
    import zlib

    import numpy as np

    from shmr_spark.multimodal.png import png_decode

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx_rows = [bytes([0, 1, 2]), bytes([2, 1, 0])]
    raw = b"".join(b"\x00" + r for r in idx_rows)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    pixels, info = png_decode(png)
    assert info["channels"] == 3
    assert pixels.shape == (2, 3, 3)
    assert (pixels[0, 0] == [255, 0, 0]).all()
    assert (pixels[1, 0] == [0, 0, 255]).all()


def test_decode_and_featurize_real_path(spark):
    """Real-decoder path through mapInPandas: true dims, pixel
    checksum, normalized features, and passthrough columns."""
    import numpy as np

    from shmr_spark.multimodal.png import png_encode

    imgs = []
    for mid, (h, w) in enumerate([(4, 6), (9, 3), (5, 5)]):
        arr = ((mid + np.arange(h * w)) % 256).astype(np.uint8).reshape(h, w)
        imgs.append((mid, png_encode(arr, filter_mode="cycle"), f"tag{mid}"))
    df = spark.createDataFrame(imgs, "media_id long, content binary, tag string")
    out = {
        r.media_id: r
        for r in decode_and_featurize(
            df, dim=8, use_real_decoder=True, passthrough=["tag"]
        ).collect()
    }
    for mid, (h, w) in enumerate([(4, 6), (9, 3), (5, 5)]):
        r = out[mid]
        assert (r.width, r.height) == (w, h)
        assert r.px_sum == int(sum((mid + i) % 256 for i in range(h * w)))
        assert r.tag == f"tag{mid}"
        assert len(r.feature) == 8
        assert all(-1.0 <= x <= 1.0 for x in r.feature)


def test_real_decoder_degrades_per_row(spark):
    """One bad blob must not kill the task: with use_real_decoder=True,
    null/empty/non-PNG rows fall back to the fake feature with null
    width/height/px_sum while PNG rows still decode for real."""
    import numpy as np

    from shmr_spark.multimodal.png import png_encode

    arr = (np.arange(12) % 256).astype(np.uint8).reshape(3, 4)
    rows = [
        (0, png_encode(arr)),          # real PNG
        (1, b"\xff\xd8\xffnotjpeg"),   # JPEG magic, no decoder
        (2, b""),                      # empty
        (3, None),                     # null
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {
        r.media_id: r
        for r in decode_and_featurize(df, dim=8, use_real_decoder=True).collect()
    }
    assert (out[0].width, out[0].height) == (4, 3)
    assert out[0].px_sum == int(arr.sum())
    for mid in (1, 2, 3):
        r = out[mid]
        assert r.width is None and r.height is None and r.px_sum is None
        assert len(r.feature) == 8


def test_jpeg_codec_solid_blocks_bit_exact():
    """Images whose 8×8 blocks are each solid gray decode BIT-exactly
    at quant=1 (DC-only blocks; integer-exact DC path) — the property
    the multimodal_jpeg_featurize oracle relies on."""
    import numpy as np

    from shmr_spark.multimodal.jpeg import is_jpeg, jpeg_decode, jpeg_encode

    vals = (np.arange(12) * 21 + 7) % 256
    img = np.kron(vals.reshape(3, 4), np.ones((8, 8), dtype=int)).astype(np.uint8)
    b = jpeg_encode(img, quant=1)
    assert is_jpeg(b)
    px, info = jpeg_decode(b)
    assert (info["width"], info["height"]) == (32, 24)
    assert (px[:, :, 0] == img).all()


def test_jpeg_codec_gradient_near_lossless():
    """Arbitrary content at quant=1: the only loss is DCT float
    rounding — every pixel within ±2, odd dimensions cropped right."""
    import numpy as np

    from shmr_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    g = ((np.arange(21)[:, None] * 7 + np.arange(35)[None, :] * 3) % 256).astype(
        np.uint8
    )
    px, info = jpeg_decode(jpeg_encode(g, quant=1))
    assert (info["width"], info["height"]) == (35, 21)
    assert px.shape == (21, 35, 1)
    assert np.abs(px[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_jpeg_codec_color_420_and_restarts():
    """4:2:0 chroma subsampling and restart markers both decode: solid
    color survives subsampling exactly; RSTn resets DC predictors."""
    import numpy as np

    from shmr_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    rgb = np.zeros((32, 48, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 180, 90, 40
    px, info = jpeg_decode(jpeg_encode(rgb, quant=1, subsampling=(2, 2)))
    assert info["subsampling"][0] == (2, 2)
    assert np.abs(px.astype(int) - rgb.astype(int)).max() <= 2

    g = ((np.arange(16)[:, None] + 17 * np.arange(64)[None, :]) % 256).astype(
        np.uint8
    )
    px2, _ = jpeg_decode(jpeg_encode(g, quant=1, restart_interval=3))
    assert np.abs(px2[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_jpeg_progressive_rejected_and_degrades():
    """Progressive JPEG (SOF2) raises NotImplementedError in the codec
    and degrades per-row (not per-task) in decode_and_featurize."""
    import numpy as np
    import pytest

    from shmr_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    b = bytearray(jpeg_encode(np.full((8, 8), 9, dtype=np.uint8)))
    i = bytes(b).index(b"\xff\xc0")
    b[i + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(b))


def test_jpeg_fill_bytes_before_marker():
    """Spec B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker code; the segment parser must skip them, not read the fill
    byte as a marker."""
    import numpy as np

    from shmr_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    img = np.kron(
        np.array([[40, 90], [140, 220]]), np.ones((8, 8), dtype=int)
    ).astype(np.uint8)
    b = jpeg_encode(img, quant=1)
    i = b.index(b"\xff\xdb")  # pad before DQT
    padded = b[:i] + b"\xff\xff\xff" + b[i:]
    px, info = jpeg_decode(padded)
    assert (info["width"], info["height"]) == (16, 16)
    assert (px[:, :, 0] == img).all()

    # fill bytes running off the end of the data must raise the
    # documented ValueError, not IndexError
    import pytest

    with pytest.raises(ValueError, match="truncated|marker"):
        jpeg_decode(b"\xff\xd8" + b"\xff" * 6)


def test_jpeg_premature_eoi_raises():
    """An entropy stream that ends at EOI with MCUs still undecoded
    must raise, not silently decode the remainder from synthesized
    zero bits (wrong px_sum is worse than a degraded row)."""
    import numpy as np
    import pytest

    from shmr_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    full = jpeg_encode(
        ((np.arange(32)[:, None] * 5 + np.arange(48)[None, :]) % 256).astype(
            np.uint8
        )
    )
    cut = full[: len(full) // 2] + b"\xff\xd9"
    with pytest.raises(ValueError):
        jpeg_decode(cut)


def test_jpeg_truncated_and_gray_sampling_factors():
    """Truncated entropy data raises ValueError (not a bare
    IndexError); a grayscale frame declaring 2x2 sampling factors
    still decodes in plain block raster (non-interleaved scan rule,
    spec B.2.3)."""
    import struct

    import numpy as np
    import pytest

    from shmr_spark.multimodal.jpeg import jpeg_decode, jpeg_encode

    full = jpeg_encode(
        ((np.arange(16)[:, None] + np.arange(24)[None, :]) % 256).astype(np.uint8)
    )
    with pytest.raises(ValueError, match="truncated"):
        jpeg_decode(full[: len(full) // 2])

    # rewrite the grayscale SOF0 sampling byte 0x11 -> 0x22: decoded
    # pixels must be unchanged (factors ignored for ns=1 scans)
    img = np.kron(
        np.array([[40, 90], [140, 220]]), np.ones((8, 8), dtype=int)
    ).astype(np.uint8)
    b = bytearray(jpeg_encode(img, quant=1))
    sof = bytes(b).index(b"\xff\xc0")
    ncomp_at = sof + 2 + 2 + 1 + 4  # marker+len+prec+dims
    assert b[ncomp_at] == 1
    assert b[ncomp_at + 2] == 0x11
    b[ncomp_at + 2] = 0x22
    px, info = jpeg_decode(bytes(b))
    assert (info["width"], info["height"]) == (16, 16)
    assert (px[:, :, 0] == img).all()


def test_decode_and_featurize_mixed_png_jpeg(spark):
    """One mapInPandas pass decodes PNG and JPEG rows side by side,
    degrading only the genuinely bad row."""
    import numpy as np

    from shmr_spark.multimodal.jpeg import jpeg_encode
    from shmr_spark.multimodal.png import png_encode

    png_img = (np.arange(30) % 256).astype(np.uint8).reshape(5, 6)
    jpg_img = np.kron(
        np.array([[10, 200], [60, 130]]), np.ones((8, 8), dtype=int)
    ).astype(np.uint8)
    rows = [
        (0, png_encode(png_img)),
        (1, jpeg_encode(jpg_img, quant=1)),
        (2, b"\x00\x01broken"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {
        r.media_id: r
        for r in decode_and_featurize(df, dim=4, use_real_decoder=True).collect()
    }
    assert (out[0].width, out[0].height, out[0].px_sum) == (6, 5, int(png_img.sum()))
    assert (out[1].width, out[1].height, out[1].px_sum) == (16, 16, int(jpg_img.sum()))
    assert out[2].width is None and len(out[2].feature) == 4


def test_wav_codec_roundtrip():
    """Stdlib WAV encode→decode round trip: 16-bit and 8-bit PCM,
    mono and stereo, exact sample recovery."""
    import numpy as np

    from shmr_spark.multimodal.wav import is_wav, wav_decode, wav_encode

    mono = (np.arange(400) % 256 - 128).astype(np.int32)
    b = wav_encode(mono, sample_rate=8000)
    assert is_wav(b)
    samples, info = wav_decode(b)
    assert info == {
        "sample_rate": 8000, "n_channels": 1, "sample_width": 2, "n_frames": 400,
    }
    assert (samples[:, 0] == mono).all()

    stereo = np.stack([mono, -mono], axis=1)
    s2, i2 = wav_decode(wav_encode(stereo, sample_rate=44100))
    assert i2["n_channels"] == 2 and i2["sample_rate"] == 44100
    assert (s2 == stereo).all()

    s8, i8 = wav_decode(wav_encode(mono, sample_rate=8000, sample_width=1))
    assert i8["sample_width"] == 1
    assert (s8[:, 0] == mono).all()  # 8-bit recentered losslessly here


def test_featurize_audio_real_and_degraded(spark):
    """featurize_audio: real WAV rows get true rate/frames/duration/
    sample-sum and a bounded envelope feature; non-WAV rows degrade
    per-row to null audio fields."""
    import numpy as np

    from shmr_spark.multimodal import featurize_audio
    from shmr_spark.multimodal.wav import wav_encode

    tone = ((np.arange(800) % 256) - 128).astype(np.int32)
    rows = [
        (0, wav_encode(tone, sample_rate=8000)),
        (1, b"RIFFbadwavnotreally"),  # RIFF magic, truncated
        (2, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in featurize_audio(df, dim=8).collect()}
    r0 = out[0]
    assert (r0.sample_rate, r0.n_samples, r0.duration_ms) == (8000, 800, 100)
    assert r0.sample_sum == int(tone.sum())
    assert len(r0.feature) == 8 and all(0.0 <= x <= 1.0 for x in r0.feature)
    for mid in (1, 2):
        r = out[mid]
        assert r.sample_rate is None and r.n_samples is None
        assert r.sample_sum is None and len(r.feature) == 8


def test_sample_frames_flatmap_shape(spark, media_df):
    frames = sample_frames(media_df, every_n_bytes=1000, max_frames=4)
    per_media = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_media[2] >= 2  # 5000-byte wav → multiple frames
    assert per_media[3] == 1  # null content → 1 placeholder frame
    assert all(n <= 4 for n in per_media.values())


def test_resize_nearest_roundtrip_and_degrade(spark):
    """resize_images: PNG round-trip is lossless, the halved image
    equals the numpy nearest-neighbor reference, and an undecodable
    row degrades per-row (err set, others unaffected)."""
    import numpy as np

    from shmr_spark.multimodal.png import png_decode
    from shmr_spark.multimodal.resize import _resize_nearest, resize_images

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(20, 14, 3), dtype=np.uint8)

    from shmr_spark.multimodal.png import png_encode

    rows = [
        (0, bytearray(png_encode(img))),
        (1, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in resize_images(df, factor=0.5).collect()}

    ok = out[0]
    assert ok.err is None and (ok.height, ok.width) == (10, 7)
    ref = _resize_nearest(img, 0.5)
    decoded = png_decode(bytes(ok.content))[0]
    assert (decoded == ref).all()
    assert ok.px_sum == int(ref.sum(dtype=np.int64))

    bad = out[1]
    assert bad.err is not None and bad.content is None and bad.px_sum == -1
