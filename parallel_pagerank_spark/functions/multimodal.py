"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

No reference counterpart; first-class training-data-pipeline components.
Decode support is split by dependency footprint:

- ``decoder="real"``: genuinely decodes the zero-dependency formats —
  JFIF JPEG, both baseline AND progressive/SOF2 (``functions/jpeg.py``,
  r4 huffman + dequant + IDCT + YCbCr validated on real libjpeg files;
  r5 adds Annex G spectral selection + successive approximation with
  EOB runs, pinned by exact-equality round-trips and a committed 4:2:0
  progressive fixture), 8-bit PNG (zlib + the five scanline filters),
  PPM (P6) and 24-bit BMP images, PCM WAV audio — via
  ``functions/codecs.py`` (numpy + stdlib only): real luma features,
  real area-downsampled 8×8 image embeddings, real RMS/zero-crossing
  audio features, real nearest-neighbor resize. Formats that still
  require external codec libraries (MP4/AVC video — PIL/turbojpeg/pyav
  are not in this container) raise NotImplementedError at the per-row
  dispatch, the explicit production integration point.
- ``decoder="fake"``: a deterministic stand-in deriving "pixels" from the
  raw bytes — for plumbing tests on arbitrary payloads.

Design: media rows are large; ``media_repartition`` sizes partitions by
accumulated byte budget (not row count) so an Arrow batch never exceeds
executor memory. All kernels run via mapInPandas over an iterator of
batches — constant memory, no collect.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from . import codecs

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURE_SCHEMA = (
    "media_id long, n_bytes long, mean_luma double, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_hash long"


def synthetic_media(
    spark, n_rows: int = 64, seed: int = 42, real_payloads: bool = False
) -> DataFrame:
    """Deterministic media table for tests. With ``real_payloads``, image
    rows carry genuine PPM/BMP bytes, audio rows genuine PCM WAV bytes,
    and video rows genuine MJPEG streams (r4) — exercising every real
    decode path end-to-end."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        kind = ["image", "audio", "video"][i % 3]
        if real_payloads and kind == "video":
            from .jpeg import encode_jpeg, encode_mjpeg
            from .mp4 import encode_mp4_mjpeg

            n_frames = int(rng.integers(3, 9))
            h = int(rng.integers(8, 17))
            w = int(rng.integers(8, 17))
            frames = [
                rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
                for _ in range(n_frames)
            ]
            if (i // 3) % 2 == 0:
                payload = encode_mjpeg(frames, quality=85)
                meta = (w, h, None, n_frames, "mjpeg")
            else:
                # r5: alternate rows carry a genuine MP4 container
                # (Motion-JPEG-in-MP4) so the ISO BMFF parse + sample
                # extraction path is exercised end-to-end
                payload = encode_mp4_mjpeg(
                    [encode_jpeg(f, quality=85) for f in frames],
                    w,
                    h,
                    fps=6,
                )
                meta = (w, h, None, n_frames, "mp4")
        elif real_payloads and kind == "image":
            h = int(rng.integers(8, 33))
            w = int(rng.integers(8, 33))
            img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            codec = "ppm" if i % 2 == 0 else "bmp"
            payload = (
                codecs.encode_ppm(img) if codec == "ppm"
                else codecs.encode_bmp(img)
            )
            meta = (w, h, None, 1, codec)
        elif real_payloads and kind == "audio":
            n = int(rng.integers(800, 4000))
            t = np.arange(n, dtype=np.float64)
            freq = float(rng.uniform(100, 2000))
            samples = 0.5 * np.sin(2 * np.pi * freq * t / 16_000)
            payload = codecs.encode_wav(
                samples.astype(np.float32), 16_000
            )
            meta = (None, None, 16_000, None, "wav")
        else:
            payload = rng.integers(
                0, 256, size=int(rng.integers(64, 2048))
            ).astype(np.uint8).tobytes()
            meta = (
                (64, 48, 16000, 30, "fake")
                if kind != "image"
                else (64, 48, None, 1, "fake")
            )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_repartition(df: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition media rows so each partition holds ~target_bytes of
    content — the byte-budget analog of spark.sql.files.maxPartitionBytes
    for in-flight binary columns."""
    total = df.select(
        F.sum(F.coalesce(F.length("content"), F.lit(0))).alias("b")
    ).first()["b"] or 0
    parts = max(1, int(total // target_bytes) + 1)
    return df.repartition(parts)


def _fake_decode(content: bytes | None, n: int = 64) -> np.ndarray:
    """Deterministic stand-in for a codec: n pseudo-pixels from the bytes."""
    if not content:
        return np.zeros(n, dtype=np.float32)
    arr = np.frombuffer(content, dtype=np.uint8)
    # deterministic fold: strided sums, stable across runs/partitions
    idx = (np.arange(n) * max(1, len(arr) // n)) % len(arr)
    return (arr[idx].astype(np.float32) / 255.0)


def image_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode → feature-extract images: (media_id, n_bytes, mean_luma,
    feature[64]). mapInPandas over Arrow batches; constant memory.

    decoder="real": JPEG/PNG/PPM/BMP bytes are actually decoded;
    mean_luma is the true BT.601 mean (scaled to [0,1]) and feature is
    the 8×8 area-mean grayscale thumbnail — a real
    decode→grayscale→resize→embed pipeline. Codecs that need external
    libraries raise NotImplementedError."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            if decoder == "real":
                # content is nullable; there is nothing to decode for a
                # NULL payload — skip the row (the fake path emits zeros)
                img = img[img["content"].notna()]
            if not len(img):
                # empty sub-batch: a yielded empty frame would carry
                # default float64 columns that Arrow cannot cast to
                # list<float> / binary — yield nothing instead
                continue
            feats = []
            lumas = []
            for c in img["content"]:
                if decoder == "real":
                    gray = codecs.grayscale(codecs.decode_image(bytes(c)))
                    thumb = codecs.block_mean_resize(gray, 8, 8) / 255.0
                    feats.append(thumb.reshape(-1).astype(np.float32))
                    lumas.append(float(gray.mean()) / 255.0)
                else:
                    f = _fake_decode(c, 64)
                    feats.append(f)
                    lumas.append(float(f.mean()))
            yield pd.DataFrame(
                {
                    "media_id": img["media_id"].astype("int64"),
                    "n_bytes": img["content"].map(
                        lambda c: len(c) if c is not None else 0
                    ),
                    "mean_luma": lumas,
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_samples long, sample_rate int, duration_sec double, "
    "rms double, zero_cross_rate double"
)


def audio_features(df: DataFrame, decoder: str = "real") -> DataFrame:
    """Decode → feature-extract audio: (media_id, n_samples, sample_rate,
    duration_sec, rms, zero_cross_rate). decoder="real" decodes PCM WAV
    with the stdlib; other containers raise NotImplementedError."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            aud = pdf[pdf["kind"] == "audio"]
            if not len(aud):
                continue
            out = {
                "media_id": [], "n_samples": [], "sample_rate": [],
                "duration_sec": [], "rms": [], "zero_cross_rate": [],
            }
            aud = aud[aud["content"].notna()]
            if not len(aud):
                continue
            for mid, c in zip(aud["media_id"], aud["content"]):
                if decoder == "real":
                    if not c or bytes(c[:4]) != b"RIFF":
                        raise NotImplementedError(
                            "audio container not decodable without external "
                            "libraries (libav); zero-dependency format is "
                            "PCM WAV"
                        )
                    x, rate = codecs.decode_wav(bytes(c))
                else:
                    x, rate = _fake_decode(c, 256) * 2 - 1, 16_000
                n = len(x)
                out["media_id"].append(int(mid))
                out["n_samples"].append(n)
                out["sample_rate"].append(rate)
                out["duration_sec"].append(n / rate if rate else 0.0)
                out["rms"].append(
                    float(np.sqrt(np.mean(x * x))) if n else 0.0
                )
                out["zero_cross_rate"].append(
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if n > 1
                    else 0.0
                )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "n_samples": pd.Series(out["n_samples"], dtype="int64"),
                    "sample_rate": pd.Series(
                        out["sample_rate"], dtype="int32"
                    ),
                    "duration_sec": out["duration_sec"],
                    "rms": out["rms"],
                    "zero_cross_rate": out["zero_cross_rate"],
                }
            )

    return df.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, content binary"


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real image resize: decode (PPM/BMP) → nearest-neighbor resample →
    re-encode as PPM. Constant-memory mapInPandas; pair with
    ``media_repartition`` so batches respect the byte budget."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            img = img[img["content"].notna()]  # nothing to resize
            if not len(img):
                continue
            out = {"media_id": [], "width": [], "height": [], "content": []}
            for mid, c in zip(img["media_id"], img["content"]):
                small = codecs.resize_image(
                    codecs.decode_image(bytes(c)), out_h, out_w
                )
                out["media_id"].append(int(mid))
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["content"].append(codecs.encode_ppm(small))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "content": out["content"],
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, every_nth: int = 10, decoder: str = "fake"
) -> DataFrame:
    """Frame-sample videos: one row per sampled frame with a stable frame
    hash.

    decoder="real": MJPEG payloads (concatenated JPEGs — the raw public
    Motion-JPEG stream format, r4) are GENUINELY frame-split and
    decoded: frame boundaries come from a marker-aware segment walk (no
    entropy decode); MP4 containers (r5, functions/mp4.py) are parsed
    via the ISO BMFF sample tables and, when the video track codec is
    'jpeg'/'mjpa' (Motion-JPEG-in-MP4), the sampled samples' byte
    ranges are extracted and decoded. Either way only every Nth frame
    pays the JPEG decode; frame_hash is a deterministic hash of the
    decoded RGB pixels. MP4 with AVC/HEVC tracks still requires
    pyav/ffmpeg and raises at the per-row dispatch. decoder="fake"
    keeps the plumbing stand-in for arbitrary payloads."""
    if decoder == "real":
        from .jpeg import decode_jpeg, decode_mjpeg_frames
        from .mp4 import extract_video_samples, is_mp4, mp4_info

        def run_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            def _hash(rgb) -> int:
                return int(
                    pd.util.hash_array(rgb.reshape(-1).astype(np.int64))
                    .sum()
                    .astype(np.int64)
                )

            for pdf in batches:
                vids = pdf[pdf["kind"] == "video"]
                vids = vids[vids["content"].notna()]
                if not len(vids):
                    continue
                out = {"media_id": [], "frame_idx": [], "frame_hash": []}
                for mid, content in zip(
                    vids["media_id"], vids["content"]
                ):
                    content = bytes(content)
                    if content[:2] == b"\xff\xd8":
                        from .jpeg import split_mjpeg

                        n_frames = len(split_mjpeg(content))
                        idxs = list(range(0, n_frames, every_nth))
                        decoded = decode_mjpeg_frames(content, idxs)
                    elif is_mp4(content):
                        info = mp4_info(content)
                        vtracks = [
                            t
                            for t in info["tracks"]
                            if t["handler"] == "vide"
                        ]
                        if not vtracks or vtracks[0]["codec"] not in (
                            "jpeg",
                            "mjpa",
                        ):
                            codec = (
                                vtracks[0]["codec"] if vtracks else "none"
                            )
                            raise NotImplementedError(
                                f"MP4 video track codec {codec!r} needs "
                                "an external decoder (pyav/ffmpeg, not "
                                "in this container); zero-dependency "
                                "decode covers Motion-JPEG-in-MP4"
                            )
                        n_frames = vtracks[0]["n_samples"]
                        idxs = list(range(0, n_frames, every_nth))
                        decoded = [
                            (fi, decode_jpeg(raw))
                            for fi, raw in extract_video_samples(
                                content, idxs
                            )
                        ]
                    else:
                        raise NotImplementedError(
                            "real video decode supports raw MJPEG "
                            "streams and MP4 containers; other "
                            "containers require pyav/ffmpeg (not in "
                            "this container)"
                        )
                    for fi, rgb in decoded:
                        out["media_id"].append(int(mid))
                        out["frame_idx"].append(fi)
                        out["frame_hash"].append(_hash(rgb))
                yield pd.DataFrame(
                    {
                        "media_id": pd.Series(
                            out["media_id"], dtype="int64"
                        ),
                        "frame_idx": pd.Series(
                            out["frame_idx"], dtype="int32"
                        ),
                        "frame_hash": pd.Series(
                            out["frame_hash"], dtype="int64"
                        ),
                    }
                )

        return df.mapInPandas(run_real, FRAME_SAMPLE_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            if not len(vids):
                continue
            out = {"media_id": [], "frame_idx": [], "frame_hash": []}
            for mid, content, meta in zip(
                vids["media_id"], vids["content"], vids["meta"]
            ):
                n_frames = (meta or {}).get("n_frames") or 0
                for fi in range(0, n_frames, every_nth):
                    fake = _fake_decode(content, 16)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(fi)
                    out["frame_hash"].append(
                        int(
                            pd.util.hash_array(
                                np.round(fake * (fi + 1), 5)
                            ).sum()
                            .astype(np.int64)
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_hash": pd.Series(out["frame_hash"], dtype="int64"),
                }
            )

    return df.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


VIDEO_FEATURE_SCHEMA = (
    "media_id long, container string, codec string, width int, "
    "height int, n_frames int, duration_sec double"
)


def video_features(df: DataFrame) -> DataFrame:
    """Sample-metadata-ONLY video curation features — codec, resolution,
    frame count, duration — without decoding a single frame:

    - MP4 containers (functions/mp4.py): the moov sample tables answer
      everything; per row the parse touches only the box headers, the
      I/O shape that makes a metadata pass over a 100 TB video corpus
      read a tiny fraction of the bytes (with parquet binary columns
      the row must still be materialized — on a production lake these
      parses run against object-store range reads).
    - raw MJPEG streams: frame boundaries from the marker-aware segment
      walk (no entropy decode), dimensions from the first frame's SOF
      header, duration unknown (0.0 — MJPEG carries no timing).
    - anything else raises at the per-row dispatch (the documented
      external-codec integration point).
    """
    from .jpeg import jpeg_dimensions, split_mjpeg
    from .mp4 import is_mp4, mp4_info

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            vids = vids[vids["content"].notna()]
            if not len(vids):
                continue
            out = {
                "media_id": [], "container": [], "codec": [],
                "width": [], "height": [], "n_frames": [],
                "duration_sec": [],
            }
            for mid, content in zip(vids["media_id"], vids["content"]):
                content = bytes(content)
                if content[:2] == b"\xff\xd8":
                    ranges = split_mjpeg(content)
                    h, w = jpeg_dimensions(
                        content[ranges[0][0] : ranges[0][1]]
                    )
                    row = ("mjpeg", "jpeg", w, h, len(ranges), 0.0)
                elif is_mp4(content):
                    info = mp4_info(content)
                    vt = [
                        t for t in info["tracks"] if t["handler"] == "vide"
                    ]
                    if not vt:
                        raise ValueError("MP4 has no video track")
                    t = vt[0]
                    row = (
                        "mp4",
                        t["codec"],
                        t["width"],
                        t["height"],
                        t["n_samples"],
                        t["duration_sec"],
                    )
                else:
                    raise NotImplementedError(
                        "video metadata supports raw MJPEG and MP4; "
                        "other containers require external parsers"
                    )
                out["media_id"].append(int(mid))
                for key, v in zip(
                    (
                        "container", "codec", "width", "height",
                        "n_frames", "duration_sec",
                    ),
                    row,
                ):
                    out[key].append(v)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "container": pd.Series(out["container"], dtype=object),
                    "codec": pd.Series(out["codec"], dtype=object),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "duration_sec": pd.Series(
                        out["duration_sec"], dtype="float64"
                    ),
                }
            )

    return df.mapInPandas(run, VIDEO_FEATURE_SCHEMA)
