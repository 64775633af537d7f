"""Zero-dependency media codecs: PPM (P6) / BMP (24-bit) images and PCM
WAV audio, encoded/decoded with numpy + the Python stdlib only.

These make the multimodal pipeline's decode step REAL for the formats that
need no external codec library; JPEG/PNG/MP4 and friends still require
PIL/libav and remain explicit NotImplementedError integration points in
functions/multimodal.py. Encoders exist so tests can round-trip
(encode → decode == original array) and synthesize realistic media tables.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Handles comments + whitespace."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — tokens separated by whitespace,
    # '#' comments run to end of line
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        tokens.append(int(content[i:j]))
        i = j
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # single whitespace after maxval
    data = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3).copy()


# ---------------------------------------------------------------- BMP (24-bit)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP (bottom-up, BGR,
    4-byte row padding)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = img[::-1, :, ::-1]  # bottom-up, RGB→BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    (
        _hdr_size,
        w,
        h,
        _planes,
        bpp,
        compression,
    ) = struct.unpack_from("<IiiHHI", content, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * h, offset=data_offset
    ).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return (rgb[::-1] if bottom_up else rgb).copy()


# ---------------------------------------------------------------- WAV (PCM)


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """float [-1, 1] or int16 mono samples → PCM16 WAV bytes."""
    if samples.dtype != np.int16:
        samples = np.clip(samples, -1.0, 1.0)
        samples = (samples * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (mono float32 samples in [-1, 1], sample_rate).
    Multi-channel input is averaged to mono."""
    with wave.open(io.BytesIO(content), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


# ---------------------------------------------------------------- transforms


def sniff_image(content: bytes | None) -> str | None:
    """'ppm' | 'bmp' | None for the supported zero-dependency formats."""
    if not content:
        return None
    if content[:2] == b"P6":
        return "ppm"
    if content[:2] == b"BM":
        return "bmp"
    return None


def decode_image(content: bytes) -> np.ndarray:
    """Dispatch on magic bytes → (h, w, 3) uint8 RGB."""
    kind = sniff_image(content)
    if kind == "ppm":
        return decode_ppm(content)
    if kind == "bmp":
        return decode_bmp(content)
    raise NotImplementedError(
        "image codec not decodable without external libraries (PIL/"
        "turbojpeg); zero-dependency formats are PPM (P6) and 24-bit BMP"
    )


def grayscale(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma, float32 in [0, 255]."""
    return (
        0.299 * img[:, :, 0].astype(np.float32)
        + 0.587 * img[:, :, 1].astype(np.float32)
        + 0.114 * img[:, :, 2].astype(np.float32)
    )


def block_mean_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downsample via uneven block means (np.add.reduceat on
    both axes) — deterministic, handles non-divisible shapes. Inputs
    SMALLER than the output grid on either axis fall back to
    nearest-neighbor sampling (block means would have zero-size blocks →
    division by zero / NaN features)."""
    h, w = gray.shape
    if h < out_h or w < out_w:
        ri = (np.arange(out_h) * h) // out_h
        ci = (np.arange(out_w) * w) // out_w
        return gray[ri][:, ci].astype(np.float32)
    ro = (np.arange(out_h) * h) // out_h
    co = (np.arange(out_w) * w) // out_w
    sums = np.add.reduceat(np.add.reduceat(gray, ro, axis=0), co, axis=1)
    rh = np.diff(np.append(ro, h)).astype(np.float32)
    cw = np.diff(np.append(co, w)).astype(np.float32)
    return sums / (rh[:, None] * cw[None, :])


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor RGB resize (uint8 in/out)."""
    h, w, _ = img.shape
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]
