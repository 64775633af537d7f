"""Count-ratio linear text classifier: train + score as aggregations.

The quality-filter step every web-scale LLM corpus carries (the
GPT-3/WebText pipeline scores pages with a linear classifier against a
high-quality reference slice, Brown et al. 2020 app. A; CCNet uses a
fastText linear model, Wenzek et al. LREC 2020): documents are kept,
dropped, or re-weighted by a linear score over their token counts.

Training a linear model from count statistics is ONE aggregation pass —
the Naive-Bayes / NBSVM family (Wang & Manning, ACL 2012, use log-count
ratios). Here the ratio is kept in EXACT cross-multiplied integer form::

    weight(t) = c_pos(t) * N_neg - c_neg(t) * N_pos

with c_side(t) the token's occurrence count in the side's training
slice and N_side the slice's total token count. The sign matches the
log-count-ratio's (both compare the per-class relative frequencies
c_pos/N_pos vs c_neg/N_neg), every weight and every document score is
an exact int64, and the DuckDB oracle reproduces them bit-identically —
no libm anywhere (the build's float discipline; see BENCH/BASELINE.md).

Integer-range tier note: |weight| <= N_pos * N_neg, so the exact tier
is safe while the two training slices' token totals multiply below 2^63
(~3·10^9 tokens per class — far beyond any *training slice* a quality
classifier needs; the CORPUS being scored is unbounded because scoring
only sums tf(t)·weight(t) over one document's tokens). For balanced
slices drawn with :func:`~parallel_pagerank_spark.functions.splits.
sample_per_stratum_k` (exactly k docs per class) the simpler
``weight = c_pos - c_neg`` is monotone-equivalent; pass
``balanced=True`` to use it and shrink the weight range accordingly.

Scale shape: training explodes the (small) training slices once and
aggregates to a vocabulary-sized model; scoring explodes the corpus
scan-side, BROADCAST-joins the model (vocabulary << corpus — the big
side never reshuffles), and aggregates per doc_id: one shuffle keyed on
the doc id, skew-free because every key is one document. No reference
counterpart (the reference consumes an already-curated edge list,
/root/reference/pagerank_mpi/csr_graph.c); this is the curation front
half a link-graph engine fed by raw web text needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import normalized_text


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) — one row per token of the canonical normalized text."""
    return docs.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "term"
        ),
    ).filter(F.col("term") != "")


def train_count_classifier(
    docs: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    balanced: bool = False,
) -> DataFrame:
    """Train the count-ratio linear model → ``(term, c_pos, c_neg,
    weight)``, one row per training-vocabulary term.

    ``label_col`` must be boolean (true = positive / high-quality
    slice). ``balanced=False`` (default) uses the exact cross-multiplied
    ratio weight ``c_pos*N_neg - c_neg*N_pos``; ``balanced=True`` uses
    the plain count difference ``c_pos - c_neg`` (appropriate when the
    two slices were drawn with equal token budgets).

    One explode + one term-keyed aggregation; the class totals join
    back as a broadcast 1-row frame so the plan stays lazy (no driver
    action at train time).
    """
    lab = F.col(label_col).cast("boolean")
    toks = _tokens(docs.select(id_col, text_col, label_col), id_col, text_col)
    toks = toks.join(
        docs.select(F.col(id_col), lab.alias("__pos")), id_col
    )
    per_term = toks.groupBy("term").agg(
        F.count_if(F.col("__pos")).alias("c_pos"),
        F.count_if(~F.col("__pos")).alias("c_neg"),
    )
    if balanced:
        return per_term.select(
            "term",
            "c_pos",
            "c_neg",
            (F.col("c_pos") - F.col("c_neg")).alias("weight"),
        )
    totals = toks.agg(
        F.count_if(F.col("__pos")).alias("__n_pos"),
        F.count_if(~F.col("__pos")).alias("__n_neg"),
    )
    return per_term.crossJoin(F.broadcast(totals)).select(
        "term",
        "c_pos",
        "c_neg",
        (
            F.col("c_pos") * F.col("__n_neg")
            - F.col("c_neg") * F.col("__n_pos")
        ).alias("weight"),
    )


def score_documents(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document under a trained model → ``(id, score,
    n_toks)``; ``score = Σ_t tf(t)·weight(t)`` (exact int64), out-of-
    vocabulary tokens contribute 0, token-less documents score 0 (a
    row is returned for EVERY input document — filters downstream must
    see the empty ones too).

    The model is broadcast (vocabulary-sized); the corpus is exploded
    scan-side and aggregated once keyed on the doc id.
    """
    toks = _tokens(docs, id_col, text_col)
    scored = (
        toks.join(
            F.broadcast(model.select("term", "weight")), "term", "left"
        )
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0))).alias("score"),
            F.count(F.lit(1)).alias("n_toks"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
            F.coalesce(F.col("n_toks"), F.lit(0)).cast("long").alias(
                "n_toks"
            ),
        )
    )


def classifier_filter(
    docs: DataFrame,
    model: DataFrame,
    threshold: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents scoring ``> threshold`` (strict — the natural 0
    default drops score-0 = fully-OOV/empty docs, matching the
    fail-closed posture of the other curation filters). Input schema
    preserved; one id-keyed semi-join against the scored set."""
    keep = (
        score_documents(docs, model, id_col, text_col)
        .filter(F.col("score") > threshold)
        .select(id_col)
    )
    return docs.join(keep, id_col, "left_semi")
