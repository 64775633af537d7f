"""Sequence-level (token-window) duplicate-span dedup — the
"exact substring deduplication" pass of Lee et al. 2022, *Deduplicating
Training Data Makes Language Models Better* (ACL'22), re-expressed as
DataFrame plans.

Document-level dedup (functions/dedup.py) drops whole near-identical
documents; this module works BELOW the document: any window of ``k``
consecutive tokens that appears verbatim in more than one document (or
many times in one) is boilerplate-grade repeated sequence — mine those
windows (:func:`duplicate_spans`) and strike every occurrence from the
corpus (:func:`remove_duplicate_spans`), keeping the surviving tokens
in original order. Lee et al. do this with a corpus-scale suffix array;
the Spark-native equivalent is the k-token fingerprint form (their
"exact substring" criterion evaluated at granularity k): a window is a
duplicate iff its k-gram occurs >= ``min_count`` times corpus-wide.

Comparison with the passage pass (functions/text.py
repeated_passages / remove_passages): passages split on a DELIMITER and
match whole fragments; spans are a SLIDING window over the token
stream, so they catch repeated sequences that cross sentence bounds or
live inside otherwise-unique sentences — the two scrubbers compose.

Scale shape (the 100 TB story):

- Window derivation is SCAN-LOCAL: ``transform(sequence(...))`` over
  the per-doc token array — positions come from the array index, never
  a window function over (doc, pos) (that would shuffle the full token
  stream once per doc for no reason).
- The only corpus-wide shuffle keys on the span — text at oracle tier,
  ``xxhash64`` fixed-width fingerprints as the scale tier (the same
  fingerprint-not-text rule as exact dedup; a 2^-64 collision strikes
  one extra window). count + countDistinct fuse into one aggregation
  with map-side partial combine.
- The scrub is doc-keyed end to end: duplicated start positions
  semi-join against the mined set, expand to covered token positions
  with ``sequence()`` (array-side, no range join), collapse to ONE
  covered-position set per doc, and the rebuild is an indexed
  ``filter()`` over the original token array — no window sort, no
  per-position shuffle for reassembly.
- Overlapping duplicated windows merge naturally: coverage is a set of
  token positions, so two overlapping hits strike their union, exactly
  the Lee et al. span-merge semantics.

Reference parity note: the reference engine has no sub-document dedup
(it is a link-graph engine, /root/reference/pagerank_mpi/pagerank_mpi.c);
this module is part of the LLM-training-data surface the brief adds on
top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import normalized_text

__all__ = ["token_spans", "duplicate_spans", "remove_duplicate_spans"]


def _tokens(text_col: str) -> Column:
    """Token array of the canonical normalized text: split on the ONE
    literal space normalization guarantees; empty text => empty array
    (split('') would yield [''])."""
    norm = normalized_text(F.col(text_col))
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ", -1)
    )


def token_spans(
    docs: DataFrame,
    k: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, pos, span): every k-token sliding window of every
    document, with its 1-based start token position. Documents shorter
    than k tokens contribute no rows. Derivation is array-side
    (scan-local); the explode is the only row expansion."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = _tokens(text_col)
    n = F.size(toks)
    windows = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k) + 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice(toks, i, k), " ").alias("span"),
            ),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(windows).alias("w")
    ).select("doc_id", F.col("w.pos").alias("pos"), F.col("w.span").alias("span"))


def duplicate_spans(
    docs: DataFrame,
    k: int = 6,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mine duplicated k-token windows -> (span, n_docs, n_occ):
    windows appearing in >= ``min_docs`` DISTINCT documents, with the
    total occurrence count. This is the mining half of the Lee et al.
    exact-substring rule at granularity k; feed the result to
    :func:`remove_duplicate_spans` to strike every occurrence.

    One shuffle, keyed on the span; ``countDistinct`` plans as the
    standard two-phase expand/partial aggregate, so a corpus-hot span
    cannot pin a single reducer with raw rows.
    """
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    return (
        token_spans(docs, k=k, id_col=id_col, text_col=text_col)
        .groupBy("span")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame | None = None,
    k: int = 6,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_tokens, n_removed, clean_text): strike every
    occurrence of every duplicated k-token window from each document
    and re-join the surviving tokens in original order — the removal
    half of Lee et al. exact-substring dedup.

    ``spans`` takes a pre-mined frame with a ``span`` column (e.g. the
    output of :func:`duplicate_spans`, possibly filtered further); when
    None it is mined from ``docs`` with the same ``k``/``min_docs``.
    Coverage is the UNION of all hit windows (overlaps merge);
    ``clean_text`` is the canonical normalized text minus covered
    tokens ('' when everything is covered — the row never disappears),
    and the original column is never mutated (the engine's per-turn
    text-equality invariant). Every doc comes back exactly once.

    Plan: mined spans semi-join the window frame (span-keyed, the one
    corpus-wide shuffle); covered positions expand array-side and
    collapse to one set per doc; the rebuild is an indexed
    ``filter(toks, (t, i) -> ...)`` against that set — no window sort.
    """
    if spans is None:
        spans = duplicate_spans(
            docs, k=k, min_docs=min_docs, id_col=id_col, text_col=text_col
        )
    wins = token_spans(docs, k=k, id_col=id_col, text_col=text_col)
    starts = wins.join(
        spans.select("span").distinct(), "span", "left_semi"
    ).select("doc_id", "pos")
    covered = (
        starts.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("cpos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("cpos").alias("cov"))
    )
    toks = _tokens(text_col)
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
    joined = base.join(covered, "doc_id", "left").withColumn(
        "cov", F.coalesce(F.col("cov"), F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.array_contains(F.col("cov"), i + F.lit(1)),
    )
    return joined.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )
