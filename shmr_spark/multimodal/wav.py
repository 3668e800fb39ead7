"""Dependency-free WAV (RIFF/PCM) codec — the second REAL media
decode path after PNG (multimodal/png.py), closing the audio leg of
the north-star multimodal brief.

Built on the stdlib ``wave`` module (PCM 8/16-bit, mono/stereo), so
the decode is real — actual samples come out — without any codec
library in the container. Samples surface as an int32 numpy array
shaped (n_frames, n_channels); 8-bit PCM (unsigned on the wire) is
recentered to signed [-128, 128) so downstream feature math is
uniform across widths.

Compressed formats (MP3/AAC/...) remain a documented
NotImplementedError boundary, same as JPEG for images
(multimodal/binary.py) — swapping in soundfile/librosa is a
one-function change.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def is_wav(content: bytes) -> bool:
    """RIFF/WAVE magic check (cheap, no parse)."""
    return (
        len(content) >= 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"WAVE"
    )


def wav_decode(content: bytes) -> tuple[np.ndarray, dict]:
    """Decode PCM WAV bytes → (samples, info).

    samples: int32 array, shape (n_frames, n_channels); 8-bit audio is
    recentered to signed. info: sample_rate, n_channels, sample_width
    (bytes), n_frames. Raises ``wave.Error`` on non-PCM/compressed
    content and NotImplementedError on unsupported sample widths."""
    with wave.open(io.BytesIO(content), "rb") as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    if width == 2:
        flat = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif width == 1:
        flat = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise NotImplementedError(
            f"{8 * width}-bit PCM unsupported (8/16-bit only)"
        )
    return flat.reshape(-1, nch), {
        "sample_rate": rate,
        "n_channels": nch,
        "sample_width": width,
        "n_frames": nframes,
    }


def wav_encode(
    samples: np.ndarray, sample_rate: int = 8000, sample_width: int = 2
) -> bytes:
    """Encode samples → PCM WAV bytes. samples: (n,) mono or
    (n, channels); values must fit the target width (int16 range for
    width 2, [-128, 128) for width 1)."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    nch = arr.shape[1]
    if sample_width == 2:
        raw = arr.astype("<i2").tobytes()
    elif sample_width == 1:
        raw = (arr + 128).astype(np.uint8).tobytes()
    else:
        raise NotImplementedError("8/16-bit PCM only")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        w.writeframes(raw)
    return buf.getvalue()
