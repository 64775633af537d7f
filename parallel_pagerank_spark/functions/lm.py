"""Bigram language-model scoring — the CCNet-style quality signal.

Public-pipeline lineage: CCNet (Wenzek et al., LREC'20) buckets web
documents by the perplexity of a reference-corpus LM; the GPT-3 /
Gopher data work uses the same shape (train a cheap LM on a trusted
slice, score the crawl, filter on the score). This module is the
engine-native version: train add-one-smoothed bigram token statistics
on a reference slice, score every document with its average negative
log-likelihood per bigram. Lower nll ≈ more like the reference corpus.

Model: P(w2 | w1) = (c(w1, w2) + 1) / (c(w1) + V), where c(w1) is the
bigram-left marginal (Σ_w2 c(w1, w2) — guarantees the smoothed
conditional normalizes exactly) and V is the distinct-token vocabulary
size of the training slice. Unseen words/bigrams degrade smoothly to
1 / (c(w1) + V).  score(doc) = −mean over the doc's bigrams of
ln P(w2 | w1); documents with fewer than 2 tokens have no bigrams and
produce no row.

Scale design (the part that matters at 100 TB):

- Bigram formation is SCAN-LOCAL — `transform(sequence(...))` over the
  token array and one `explode`, never a window over (doc, pos) (a
  window would shuffle the full token stream by doc_id for no reason).
- Counting is one hash aggregation each for bigrams and marginals
  (map-side partial combine does the heavy lifting; key cardinality is
  vocabulary-bounded, not corpus-bounded).
- V rides along as a broadcast one-row frame, keeping the whole plan
  lazy (no driver-side action inside the operator).
- Scoring joins are keyed on token strings: the model tables are
  vocabulary-sized, so for a typical reference slice AQE broadcasts
  them; a giant model degrades to an ordinary shuffled equi-join, never
  a cartesian.

Everything is built-in Column expressions — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_SPLIT = r"\s+"


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), TOKEN_SPLIT)


def _bigrams(df: DataFrame, text_col: str) -> DataFrame:
    """Explode (w1, w2) bigram rows, scan-local. Empty/1-token docs get
    a NULL pair array, which explode() drops."""
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    # F.get (not [] indexing) tolerates any index under ANSI mode; the
    # when-guard also keeps sequence() ascending (sequence(1, 0) would
    # DESCEND, not stop).
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.get(toks, i - 1).alias("w1"),
                F.get(toks, i).alias("w2"),
            ),
        ),
    )  # no otherwise: NULL for <2-token docs — explode() emits nothing
    return df.withColumn("__bg", F.explode(pairs)).select(
        *[c for c in df.columns if c != text_col],
        F.col("__bg.w1").alias("w1"),
        F.col("__bg.w2").alias("w2"),
    )


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (w1, w2, n): bigram occurrence counts over the corpus."""
    return (
        _bigrams(docs.select(text_col), text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
    )


def bigram_lm_score(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_bigrams, nll): average negative log-likelihood of
    each document in ``score`` under the add-one bigram model trained
    on ``train`` (see module docstring for the exact model)."""
    bc = bigram_counts(train, text_col)
    mc = bc.groupBy("w1").agg(F.sum("n").alias("nu"))
    vocab = (
        train.select(
            F.explode(_tokens(F.col(text_col))).alias("tok")
        )
        .agg(F.count_distinct("tok").alias("vs"))
    )
    sb = _bigrams(score.select(id_col, text_col), text_col)
    lp = F.log(
        (F.coalesce(F.col("nb"), F.lit(0)) + F.lit(1)).cast("double")
        / (F.coalesce(F.col("nu"), F.lit(0)) + F.col("vs")).cast("double")
    )
    return (
        sb.join(F.broadcast(vocab))
        .join(bc.withColumnRenamed("n", "nb"), ["w1", "w2"], "left")
        .join(mc, "w1", "left")
        .groupBy(F.col(id_col).alias("doc_id"))
        .agg(
            F.count("*").alias("n_bigrams"),
            (-F.avg(lp)).alias("nll"),
        )
    )
