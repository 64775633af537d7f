"""Deterministic source-mixture scheduling — the "mixing weights" pass
of large-scale LM training pipelines (GPT-3, Brown et al. 2020 Table
2.2; The Pile, Gao et al. 2021 Table 1): each corpus source is seen a
configurable number of EPOCHS per training run (high-quality sources
2-3x, bulk web < 1x), and the replicated stream is interleaved into one
global training order.

The classic implementation is a sampler; at 100 TB a random sampler is
neither reproducible nor resumable, so this is the deterministic
re-expression (the same philosophy as ``functions/splits.py``): every
(document, epoch) pair exists — or not — purely as a function of the
doc id, and its position in the training order is a portable hash of
(id, epoch). Re-running, re-partitioning, or resuming mid-run can never
change the schedule.

Semantics of ``weights[s] = w``:

- every doc of source ``s`` appears ``floor(w)`` times (epochs
  ``0 .. floor(w)-1``), and
- once more (epoch ``floor(w)``) iff its portable bucket
  < ``frac(w) * 2^32`` — so the expected multiplicity is exactly ``w``
  and the extra-epoch subset is the SAME stable subset
  ``stratified_sample`` would pick (monotone in ``w``: raising a
  source's weight only ever adds (doc, epoch) rows).
- sources absent from ``weights`` are dropped (fail-closed, the
  ``stratified_sample`` convention — an unlisted source silently
  training at weight 1 is the worse failure).

Scale shape: epoch replication is ARRAY-SIDE (``sequence`` + explode —
rows never join anything), the order key is pure Column arithmetic, and
the output is ``O(Σ w_s · |s|)`` rows with no shuffle at all — the
consumer sorts/range-partitions by ``order_bucket`` exactly once, which
is the unavoidable shuffle of materializing a training order.

Reference parity note: no counterpart in the reference engine
(/root/reference/pagerank_mpi/); part of the LLM-pipeline surface the
brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .splits import _M, split_bucket, split_bucket_sql, _sql_str

__all__ = ["mixture_schedule", "mixture_schedule_sql"]

# mixes the epoch into the portable hash's id space; any odd constant
# well below 2^31 works (the hash reduces mod the Mersenne-31 prime)
_EPOCH_STRIDE = 1_000_003


def mixture_schedule(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: int = 0,
    method: str = "portable",
) -> DataFrame:
    """-> ``(doc_id, source, epoch, order_bucket)``: the deterministic
    weighted training-mixture schedule (see module docstring). Sort by
    ``order_bucket`` (ties broken by (doc_id, epoch), already unique in
    expectation) to materialize the training order; sources interleave
    uniformly because every (doc, epoch) hashes independently."""
    if not weights:
        raise ValueError("weights must name at least one source")
    for s, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for {s!r} must be > 0, got {w}")
    src = F.col(source_col)
    full = F.lit(None).cast("int")
    thresh = F.lit(None).cast("long")
    for s, w in weights.items():
        full = F.when(src == F.lit(s), F.lit(int(w))).otherwise(full)
        thresh = F.when(
            src == F.lit(s), F.lit(int((w - int(w)) * _M))
        ).otherwise(thresh)
    pick = split_bucket(F.col(id_col), salt=salt, method=method)
    k = full + F.when(pick < thresh, F.lit(1)).otherwise(F.lit(0))
    epochs = F.when(k >= 1, F.sequence(F.lit(0), k - 1))
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        src.alias("source"),
        F.explode(epochs).alias("epoch"),
    )
    order = split_bucket(
        F.col("doc_id") + F.col("epoch") * F.lit(_EPOCH_STRIDE),
        salt=salt,
        method=method,
    )
    return out.select(
        "doc_id", "source", "epoch", order.alias("order_bucket")
    )


def mixture_schedule_sql(
    weights: dict[str, float],
    id_expr: str = "doc_id",
    source_expr: str = "source",
    table: str = "documents",
    salt: int = 0,
) -> str:
    """ANSI-SQL mirror of :func:`mixture_schedule` (portable tier) for
    the DuckDB oracle — the same fail-closed source map, extra-epoch
    threshold, and (id + epoch * stride) order hash."""
    if not weights:
        raise ValueError("weights must name at least one source")
    full_arms = " ".join(
        f"WHEN {source_expr} = {_sql_str(s)} THEN {int(w)}"
        for s, w in weights.items()
    )
    th_arms = " ".join(
        f"WHEN {source_expr} = {_sql_str(s)} THEN {int((w - int(w)) * _M)}"
        for s, w in weights.items()
    )
    pick = split_bucket_sql(id_expr, salt=salt)
    order = split_bucket_sql(
        f"doc_id + epoch * {_EPOCH_STRIDE}", salt=salt
    )
    return f"""
WITH mix AS (
  SELECT {id_expr} AS doc_id, {source_expr} AS source,
         (CASE {full_arms} END)
         + (CASE WHEN {pick} < (CASE {th_arms} END) THEN 1 ELSE 0 END)
           AS k
  FROM {table}
  WHERE (CASE {full_arms} END) IS NOT NULL),
sched AS (
  SELECT doc_id, source, unnest(generate_series(0, k - 1))::INT AS epoch
  FROM mix WHERE k >= 1)
SELECT doc_id, source, epoch, {order} AS order_bucket
FROM sched"""
