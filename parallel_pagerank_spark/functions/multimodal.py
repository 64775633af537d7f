"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

No reference counterpart; first-class training-data-pipeline components.
The decode/feature kernels need codec libraries that are NOT in this
container, so the kernels are stubbed two ways:

- ``decoder="fake"`` (default in tests): a deterministic fake that derives
  "pixels"/"samples" from the bytes' hash — the full Spark-side plumbing
  (schema, Arrow batching via mapInPandas, partition sizing) is real and
  tested.
- ``decoder="real"``: raises NotImplementedError with the dependency it
  would use (PIL/libav) — the marked integration point for production.

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


def synthetic_media(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 2048))).astype(
            np.uint8
        ).tobytes()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64, 48, 16000, 30, "fake") if kind != "image" else (64, 48, None, 1, "fake"),
            )
        )
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
    feature[64]). mapInPandas over Arrow batches; constant memory."""
    if decoder == "real":
        raise NotImplementedError(
            "real image decode requires PIL/turbojpeg (not in this "
            "container); wire it into _decode below"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            feats = [
                _fake_decode(c, 64) for c in img["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": img["media_id"].astype("int64"),
                    "n_bytes": img["content"].map(
                        lambda c: len(c) if c is not None else 0
                    ),
                    "mean_luma": [float(f.mean()) for f in feats],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame, every_nth: int = 10, decoder: str = "fake"
) -> DataFrame:
    """Frame-sample videos: one row per sampled frame with a stable frame
    hash (stand-in for the decoded frame tensor)."""
    if decoder == "real":
        raise NotImplementedError(
            "real video decode requires pyav/ffmpeg (not in this container)"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
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
