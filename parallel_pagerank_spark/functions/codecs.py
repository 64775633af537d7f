"""Zero-dependency media codecs: PPM (P6) / BMP (24-bit) / PNG /
baseline JPEG images and PCM WAV audio, with numpy + the Python stdlib
only.

These make the multimodal pipeline's decode step REAL for the formats a
training corpus actually contains: baseline JFIF JPEG (functions/jpeg.py
— huffman + dequant + IDCT + YCbCr, validated against real libjpeg
files) and 8-bit PNG (zlib + the five scanline filters) joined PPM/BMP/
WAV in r4. Progressive JPEG and video containers (MP4) still require
external codecs and remain explicit NotImplementedError integration
points in functions/multimodal.py. Encoders exist so tests can
round-trip (encode → decode == original array) and synthesize realistic
media tables.
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
    """'ppm' | 'bmp' | 'png' | 'jpeg' | None for the supported
    zero-dependency formats."""
    if not content:
        return None
    if content[:2] == b"P6":
        return "ppm"
    if content[:2] == b"BM":
        return "bmp"
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if content[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def decode_image(content: bytes) -> np.ndarray:
    """Dispatch on magic bytes → (h, w, 3) uint8 RGB."""
    kind = sniff_image(content)
    if kind == "ppm":
        return decode_ppm(content)
    if kind == "bmp":
        return decode_bmp(content)
    if kind == "png":
        return decode_png(content)
    if kind == "jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(content)
    raise NotImplementedError(
        "image codec not decodable without external libraries; "
        "zero-dependency formats are PPM (P6), 24-bit BMP, 8-bit PNG, "
        "and baseline JFIF JPEG"
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


# ---------------------------------------------------------------- PNG


def decode_png(content: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB, zero-dependency (stdlib zlib).

    Supports 8-bit color types 0 (gray), 2 (RGB), 3 (palette), 4
    (gray+alpha), 6 (RGBA) with all five scanline filters (None/Sub/Up/
    Average/Paeth, RFC 2083 §6); no interlace (Adam7 raises). Alpha is
    dropped (pixels returned un-composited) — the multimodal feature
    path consumes opaque rasters. Exactly inverts plans/plots.write_png
    (lossless roundtrip pinned in tests)."""
    import zlib as _zlib

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos < len(content):
        ln = struct.unpack_from(">I", content, pos)[0]
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8:
        raise NotImplementedError(
            f"PNG bit depth {bit_depth}; only 8-bit supported"
        )
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"bad PNG color type {color_type}")
    raw = _zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(h):
        f = filters[y]
        cur = rows[y, 1:].astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y else np.zeros(
            stride, np.int64
        )
        if f == 0:  # None
            line = cur
        elif f == 2:  # Up
            line = (cur + prior) & 0xFF
        else:
            # Sub/Average/Paeth need the in-progress line — sequential in
            # x is inherent to the format; vectorized across the row's
            # bytes per pixel-offset would still recur, so plain loop
            # (rows are short; scale path batches whole files per task)
            line = np.zeros(stride, np.int64)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prior[x]
                if f == 1:  # Sub
                    v = cur[x] + a
                elif f == 3:  # Average
                    v = cur[x] + ((a + b) >> 1)
                elif f == 4:  # Paeth
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    v = cur[x] + pred
                else:
                    raise ValueError(f"bad PNG filter {f}")
                line[x] = v & 0xFF
        out[y] = line.astype(np.uint8)
    px = out.reshape(h, w, channels)
    if color_type == 2:
        return px.copy()
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[px[:, :, 0]]
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # 6: RGBA -> drop alpha
