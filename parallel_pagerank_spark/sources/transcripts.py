"""Transcripts source — the engine's primary external input.

Schema (BASELINE.json input_hint): conv_id string, turn_idx int32,
role string, text string, tool string (nullable), ts timestamp.

Production storage is an Iceberg table; the sandbox has no Iceberg runtime
jars, so ``read_transcripts`` is a storage adapter: Iceberg catalog table if
the name resolves, else a Parquet path (SURVEY.md §7 risk note).

Also hosts the deterministic synthetic generator used by tests and BENCH —
the stand-in for the driver's fixture generators (dashboard/app.py:1441-1499,
seed 42); all graph shapes there are reproduced at transcript level.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Storage adapter: Iceberg table name if resolvable, else Parquet path."""
    if not ("/" in source or source.endswith(".parquet")):
        try:
            return spark.read.table(source)
        except Exception:
            pass
    return spark.read.parquet(source)


def synthetic_transcripts(
    spark: SparkSession,
    n_conversations: int = 100,
    mean_turns: int = 8,
    tool_vocab: tuple[str, ...] = ("search", "code", "browser", "sql"),
    tool_rate: float = 0.25,
    seed: int = 42,
) -> DataFrame:
    """Deterministic synthetic transcripts (seed fixed, FIXTURES.md §1).

    Geometric(#turns) per conversation (mean ≈ mean_turns, min 2), roles
    alternate user/assistant, a seeded fraction of assistant turns invokes a
    tool from a small vocabulary (so handoff links form hubs), text is a
    seeded token string prefixed with the stable turn key, ts is monotone
    within a conversation.
    """
    rng = np.random.default_rng(seed)
    rows = []
    base_ts = pd.Timestamp("2026-01-01T00:00:00")
    for c in range(n_conversations):
        conv_id = f"conv-{c:06d}"
        n_turns = 2 + int(rng.geometric(1.0 / max(1, mean_turns - 1)))
        for t in range(n_turns):
            role = "user" if t % 2 == 0 else "assistant"
            tool = None
            if role == "assistant" and rng.random() < tool_rate:
                tool = tool_vocab[int(rng.integers(len(tool_vocab)))]
            token = int(rng.integers(1_000_000))
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": t,
                    "role": role,
                    "text": f"{conv_id}:{t}:tok{token}",
                    "tool": tool,
                    "ts": base_ts
                    + pd.Timedelta(seconds=c * 10_000 + t * 7),
                }
            )
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
