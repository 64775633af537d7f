"""Structured-Streaming exact deduplication of a document stream.

The batch operator (functions/dedup.exact_dedup_mapping) canonicalizes a
static corpus; a continuously-ingesting pipeline instead needs to decide
PER ARRIVING DOCUMENT whether its content was already seen — across
micro-batches. Two engine paths:

- ``streaming_exact_dedup``: the Spark-native path —
  ``dropDuplicates`` on the 64-bit content fingerprint. State is the
  fingerprint set, managed by the streaming state store (RocksDB-backed
  on a real cluster); with a watermark + ``dropDuplicatesWithinWatermark``
  the state is bounded for time-bounded duplicate horizons.
- ``streaming_dedup_counts``: a per-fingerprint stateful counter via
  ``applyInPandasWithState`` emitting (fingerprint, first doc_id,
  running dup_count) updates — the streaming analogue of
  functions/dedup.exact_dedup's (keep_id, dup_count) rows, for pipelines
  that want duplicate-pressure metrics, not just the survivors.

Scale notes: the shuffle key is always the 64-bit fingerprint, never the
text (the same rule as the batch path — at 100 TB the dedup shuffle must
be fixed-width). The fingerprint is computed with the engine-wide
canonical normalization, so batch and stream agree on what "same
content" means. State per distinct fingerprint is O(16 bytes) + store
overhead; a duplicate horizon (watermark) caps it in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.dedup import _normalized

_DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.LongType(), False),
        T.StructField("keep_id", T.LongType(), True),
        T.StructField("dup_count", T.LongType(), False),
    ]
)

_DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keep_id", T.LongType(), True),
        T.StructField("dup_count", T.LongType(), True),
    ]
)


def fingerprinted(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fingerprint) over the canonical normalized text — works
    on both batch and streaming DataFrames (pure Column expressions)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.xxhash64(_normalized(F.col(text_col))).alias("fingerprint"),
    )


def streaming_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """First-seen-wins streaming dedup: emits each arriving document
    whose content fingerprint has not been seen in any earlier
    micro-batch (or earlier in the same batch). State = the fingerprint
    set in the streaming state store."""
    return fingerprinted(docs, id_col, text_col).dropDuplicates(
        ["fingerprint"]
    )


def _dedup_state_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        keep_id, dup_count = state.get
    else:
        keep_id, dup_count = None, 0
    batch_min, batch_n = None, 0
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            batch_min = m if batch_min is None else min(batch_min, m)
            batch_n += len(pdf)
    # first-BATCH-seen wins; within that batch the smallest id (row order
    # inside a micro-batch group is not deterministic, min is)
    if keep_id is None:
        keep_id = batch_min
    dup_count += batch_n
    state.update((keep_id, dup_count))
    yield pd.DataFrame(
        {
            "fingerprint": [key[0]],
            "keep_id": [keep_id],
            "dup_count": [dup_count],
        }
    )


def streaming_dedup_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Running (fingerprint, keep_id, dup_count) per distinct content:
    keep_id is the first-seen doc_id (ties within the first batch go to
    the smallest id, matching the batch operator's min-id rule only when
    arrival order is id order — streaming keep semantics are first-SEEN,
    documented difference), dup_count the total seen so far. Emits one
    updated row per fingerprint per micro-batch that touched it
    (update-mode sink)."""
    fp = fingerprinted(docs, id_col, text_col)
    return fp.groupBy("fingerprint").applyInPandasWithState(
        _dedup_state_fn,
        outputStructType=_DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
