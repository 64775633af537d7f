"""Text-analysis operators for large-scale training-data pipelines.

No reference counterpart (the reference is numeric-only); these are the
document-table operators a 100 TB curation pipeline needs. All hot-path
expressions are built-in Column functions (JVM-side, whole-stage codegen);
no per-row Python anywhere.

Design note for oracle parity: token/quality/language expressions use only
functions with identical semantics in DuckDB (length, lower, regexp_replace,
replace, split) so the driver's DuckDB cross-check can run the same logic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# A BPE-ish word/number/punctuation segmentation: word pieces, numbers,
# single punctuation marks — the usual pre-tokenizer shape (GPT-2 style
# regex reduced to a portable core).
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
)

# language-ID marker words: high-frequency function words that are
# near-exclusive to each language (n-gram/stopword heuristic)
LANG_MARKERS = {
    "en": ("the", "and", "with", "this", "have"),
    "de": ("der", "und", "nicht", "das", "ist"),
    "fr": ("les", "des", "est", "une", "dans"),
    "es": ("los", "las", "por", "una", "con"),
}


def normalized_text(col: Column) -> Column:
    """THE canonical whitespace normalization used engine-wide (dedup
    fingerprints, shingles, language-ID, document fingerprints — and
    mirrored by the DuckDB oracle SQL): lowercase, collapse whitespace
    runs to one space, then trim. Collapse happens BEFORE trim because
    Spark/DuckDB trim() strips spaces only — a leading tab/newline must
    first become a space to be trimmed. Change it here and in
    __spark_entry__._NORM_TEXT_SQL together, nowhere else."""
    return F.trim(
        F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))), r"\s+", " ")
    )


def whitespace_token_count(col: Column) -> Column:
    """Number of whitespace-separated tokens (0 for empty/blank)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpeish_token_count(col: Column) -> Column:
    """Token count under the BPE-ish segmentation regex."""
    return F.regexp_count(col, F.lit(BPE_ISH_REGEX))


def _count_occurrences(col: Column, needle: str) -> Column:
    """Occurrences of a literal substring — (len(x) - len(replace(x, n, '')))
    / len(n); portable to any SQL engine."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle)))
    ) / len(needle)


def quality_features(text_col: str = "text") -> list[Column]:
    """Length / punctuation / stopword / casing features used for quality
    scoring. All ratios in [0,1], null-safe (empty text → 0)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n = F.greatest(F.length(c), F.lit(1)).cast("double")
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    n_tokens = whitespace_token_count(c)
    stopword_hits = sum(
        (_count_occurrences(padded, f" {w} ") for w in STOPWORDS),
        F.lit(0.0),
    )
    return [
        F.length(c).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (
            F.length(F.regexp_replace(c, r"[^\p{Punct}]", "")) / n
        ).alias("punct_ratio"),
        (
            F.length(F.regexp_replace(c, r"[^A-Z]", "")) / n
        ).alias("upper_ratio"),
        (F.length(F.regexp_replace(c, r"[^0-9]", "")) / n).alias(
            "digit_ratio"
        ),
        (
            stopword_hits
            / F.greatest(n_tokens, F.lit(1)).cast("double")
        ).alias("stopword_ratio"),
        (n / F.greatest(n_tokens, F.lit(1)).cast("double")).alias(
            "mean_token_len"
        ),
    ]


def quality_score(text_col: str = "text") -> Column:
    """Scalar quality score in [0,1]: rewards stopword presence and moderate
    token length, penalizes punctuation/digit noise. A deterministic
    heuristic (Gopher-style rule flavor), not a learned model."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    n = F.greatest(F.length(c), F.lit(1)).cast("double")
    n_tokens = whitespace_token_count(c).cast("double")
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    stop = sum(
        (_count_occurrences(padded, f" {w} ") for w in STOPWORDS),
        F.lit(0.0),
    ) / F.greatest(n_tokens, F.lit(1.0))
    punct = F.length(F.regexp_replace(c, r"[^\p{Punct}]", "")) / n
    digit = F.length(F.regexp_replace(c, r"[^0-9]", "")) / n
    mean_tok = n / F.greatest(n_tokens, F.lit(1.0))
    len_ok = F.when(
        (mean_tok >= 3) & (mean_tok <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                len_ok
                * (F.lit(0.5) + F.least(stop * 2, F.lit(0.5)))
                * (F.lit(1.0) - F.least(punct * 2, F.lit(0.5)))
                * (F.lit(1.0) - F.least(digit * 2, F.lit(0.5))),
            ),
        ),
        6,
    )


def language_id(text_col: str = "text") -> Column:
    """n-gram/stopword-marker language guess over LANG_MARKERS: count marker
    hits per language on the lowercased, space-padded text; argmax with
    deterministic tie-break (marker count desc, then language code asc);
    'und' (undetermined) when nothing matches.

    Counts run over whitespace-NORMALIZED text (trim + collapse runs to a
    single space) so a marker word adjacent to a tab/newline still counts —
    the same normalization the DuckDB oracle applies."""
    padded = F.concat(
        F.lit(" "), normalized_text(F.col(text_col)), F.lit(" ")
    )
    scores = [
        (
            lang,
            sum(
                (_count_occurrences(padded, f" {w} ") for w in words),
                F.lit(0.0),
            ),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    best = None
    best_score = None
    # fold right-to-left so earlier (asc) languages win ties
    for lang, score in reversed(scores):
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            take = score >= best_score
            best = F.when(take, F.lit(lang)).otherwise(best)
            best_score = F.when(take, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def document_fingerprint(text_col: str = "text") -> Column:
    """64-bit document fingerprint: xxhash64 of the whitespace-normalized,
    lowercased text — the rolling-hash content id used for near-dup
    bookkeeping. Deterministic across runs/partitionings."""
    return F.xxhash64(normalized_text(F.col(text_col)))


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text analysis: id column(s) + token counts + quality features
    + language + fingerprint. Single projection, whole-stage codegen."""
    return docs.select(
        "*",
        bpeish_token_count(F.col(text_col)).alias("n_bpeish_tokens"),
        *quality_features(text_col),
        quality_score(text_col).alias("quality"),
        language_id(text_col).alias("lang_guess"),
        document_fingerprint(text_col).alias("fingerprint"),
    )


def term_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary table over whitespace tokens of the canonical
    normalized text: ``(term, df, total_tf)`` — document frequency and
    total occurrence count per term. The df side of tf_idf exposed as
    its own operator (vocabulary audits, stopword discovery, top-terms
    reporting).

    Scale shape: explode → one shuffle on (doc, term) to collapse
    per-doc repeats, then one on term; the result is |vocabulary| rows,
    orders of magnitude smaller than the corpus."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    per_doc = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    return per_doc.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )


def tf_idf(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-(doc, term) TF-IDF over whitespace tokens of the canonical
    normalized text: ``(doc_id, term, tf, tfidf)``.

    Standard smooth formulation (as popularized by scikit-learn's
    TfidfTransformer docs): idf(t) = ln((1+N)/(1+df(t))) + 1, tfidf =
    tf · idf — never zero, no division by zero, no per-row Python.

    Scale shape: explode → ONE shuffle on (doc, term) for tf, ONE
    aggregation on term for df (tiny result: |vocabulary| rows), then a
    BROADCAST join of the df table back onto tf — the vocabulary is
    orders of magnitude smaller than the corpus, so the big side never
    reshuffles. N comes in via a broadcast 1-row cross join, keeping the
    whole computation one lazy plan (no driver-side count action).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("n_docs"))
                        / (F.lit(1.0) + F.col("df"))
                    )
                    + F.lit(1.0)
                )
            ).alias("tfidf"),
        )
    )


def bm25(
    docs: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 per ``(doc, term)`` over whitespace tokens of the
    canonical normalized text: ``(doc_id, term, tf, dl, bm25)`` — the
    probabilistic ranking function of Robertson & Walker SIGIR'94, in
    the always-positive idf variant Lucene ships::

        idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(d, t) = idf(t) * tf * (k1+1)
                      / (tf + k1 * (1 - b + b * dl / avgdl))

    ``N`` and ``avgdl`` are over documents with >= 1 token (token-free
    docs produce no (doc, term) rows and would only dilute avgdl).

    Scale shape (same discipline as :func:`tf_idf`): the document
    length ``dl`` is taken from the token ARRAY before the explode and
    carried through the tf aggregation as a ``max`` — so the corpus
    shuffles ONCE, on (doc, term). The df table (|vocabulary| rows) is
    broadcast back; N/avgdl arrive via a broadcast 1-row cross join
    keeping the plan lazy (no driver-side count action).
    """
    if k1 < 0:
        raise ValueError(f"k1 must be >= 0, got {k1}")
    if not 0 <= b <= 1:
        raise ValueError(f"b must be in [0, 1], got {b}")
    norm = normalized_text(F.col(text_col))
    toks_arr = F.when(
        F.length(norm) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(norm, " ", -1))
    base = docs.select(F.col(id_col), toks_arr.alias("toks"))
    exploded = base.select(
        id_col,
        F.size("toks").cast("long").alias("dl"),
        F.explode("toks").alias("term"),
    )
    tf = exploded.groupBy(id_col, "term").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = (
        base.select(F.size("toks").cast("long").alias("dl"))
        .filter(F.col("dl") > 0)
        .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
            "tf",
            "dl",
            (idf * F.col("tf") * F.lit(k1 + 1.0) / denom).alias("bm25"),
        )
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition signals over whitespace tokens of the
    canonical normalized text — the word/n-gram repetition family of
    quality filters used by large-scale corpus curation (the published
    Gopher rules, Rae et al. 2021 arXiv:2112.11446 §A1.1, measure
    duplicate line/paragraph/n-gram fractions; these are the single-line
    analogues):

      n_words            total token occurrences
      n_distinct_words   distinct tokens
      dup_word_frac      1 - distinct/total (fraction of repeats)
      top_word_frac      occurrences of the most frequent token / total
      top_bigram_frac    occurrences of the most frequent bigram /
                         total bigram slots (n_words - 1; 0 when < 2)

    High dup_word_frac / top_*_frac flag degenerate, loopy, or
    boilerplate text for downstream filtering.

    Scale shape: ONE explode per granularity, aggregations keyed on
    (doc, token) then (doc) — the document id is always in the shuffle
    key, so corpus-wide hot tokens ('the') can NOT skew a partition the
    way a token-keyed shuffle would. Pure built-in Columns, no Python.
    """
    toks = docs.select(
        F.col(id_col),
        F.split(normalized_text(F.col(text_col)), " ").alias("w"),
    ).select(F.col(id_col), F.explode("w").alias("term")).filter(
        F.col("term") != ""
    )
    wc = toks.groupBy(id_col, "term").agg(F.count("*").alias("c"))
    word_sig = wc.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct_words"),
        F.max("c").alias("top_word_c"),
    )
    w = F.split(normalized_text(F.col(text_col)), " ")
    bigrams = docs.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - F.lit(1)),
                    lambda i: F.concat_ws(
                        " ", F.element_at(w, i), F.element_at(w, i + 1)
                    ),
                ),
            ).otherwise(F.array())
        ).alias("bg"),
    )
    bc = bigrams.groupBy(id_col, "bg").agg(F.count("*").alias("c"))
    bg_sig = bc.groupBy(id_col).agg(F.max("c").alias("top_bigram_c"))
    return (
        word_sig.join(bg_sig, id_col, "left")
        .select(
            F.col(id_col),
            "n_words",
            "n_distinct_words",
            (
                F.lit(1.0)
                - F.col("n_distinct_words") / F.col("n_words").cast("double")
            ).alias("dup_word_frac"),
            (F.col("top_word_c") / F.col("n_words").cast("double")).alias(
                "top_word_frac"
            ),
            F.when(F.col("n_words") >= 2,
                   F.coalesce(F.col("top_bigram_c"), F.lit(0)).cast("double")
                   / (F.col("n_words") - F.lit(1)).cast("double"))
            .otherwise(F.lit(0.0))
            .alias("top_bigram_frac"),
        )
    )


def bigram_lift(
    docs: DataFrame,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> DataFrame:
    """Corpus-level collocation mining: adjacent word pairs of the
    canonical normalized text scored by lift,

        lift(w1, w2) = P(w1 w2) / (P(w1) * P(w2))
                     = (pair_count * total_words^2)
                       / (total_pairs * c(w1) * c(w2))

    the log-free core of PMI (PMI = log2(lift); Church & Hanks 1990).
    Log is deliberately NOT applied so every arithmetic step is exact
    integer counting followed by one IEEE division chain that DuckDB
    reproduces bit-for-bit — the driver oracle hash-matches without
    float-tolerance games. Returns
    (w1, w2, pair_count, c1, c2, lift) for pairs with
    pair_count >= min_pair_count.

    Scale shape: pairs are derived ARRAY-SIDE per document (transform
    over sequence, same pattern as repetition_signals) — no window, no
    per-document shuffle, the only shuffles are the two hash
    aggregations keyed on the pair / the word. The two global totals
    are single scalar aggs folded into the final projection as
    literals. No Python in the pipeline.
    """
    w = F.filter(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda x: x != F.lit(""),
    )
    arr = docs.select(w.alias("w"))
    words = arr.select(F.explode("w").alias("w"))
    pairs = arr.select(
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - F.lit(1)),
                    lambda i: F.struct(
                        F.element_at("w", i).alias("w1"),
                        F.element_at("w", i + F.lit(1)).alias("w2"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("p")
    ).select("p.w1", "p.w2")
    pair_c = pairs.groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))
    word_c = words.groupBy("w").agg(F.count("*").alias("c"))
    total_words = words.count()
    total_pairs = pairs.count()
    c1 = word_c.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = word_c.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    # word-count side is tiny relative to the pair table: broadcast both
    from pyspark.sql.functions import broadcast

    return (
        pair_c.filter(F.col("pair_count") >= min_pair_count)
        .join(broadcast(c1), "w1")
        .join(broadcast(c2), "w2")
        .select(
            "w1",
            "w2",
            "pair_count",
            "c1",
            "c2",
            (
                (
                    F.col("pair_count").cast("double")
                    * F.lit(float(total_words))
                    * F.lit(float(total_words))
                )
                / (
                    F.lit(float(total_pairs))
                    * F.col("c1").cast("double")
                    * F.col("c2").cast("double")
                )
            ).alias("lift"),
        )
    )


def token_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram Shannon entropy — the information-density
    quality signal complementing repetition_signals: low-entropy docs
    are keyword-stuffed / template / repeated-token text, high-entropy
    docs have diverse vocabulary.

        H = ln(T) - (Σ_w c_w·ln(c_w)) / T      (nats; T = token count)

    computed in that rearranged form so the per-token work is one
    c·ln(c) term over the (doc, word) count table — the Σ is a plain
    hash aggregation keyed by doc_id. Returns
    (doc_id, n_tokens, n_distinct, entropy, entropy_ratio) where
    entropy_ratio = H / ln(n_distinct) ∈ [0, 1] (1 = all tokens
    distinct or uniform; 0 for single-token docs by convention).

    Scale shape: tokens explode out of the array JVM-side; both
    aggregations are keyed by doc_id (+word), so corpus-hot words can
    never skew a shuffle partition — the same doc-keyed rule as
    repetition_signals. Docs with no tokens yield n_tokens = 0 and
    entropy 0.

    Determinism: the Σ c·ln(c) term is folded LEFT-TO-RIGHT over the
    ascending-sorted count multiset (sort_array + aggregate), not a
    partition-order hash aggregation — float addition is not
    associative, and an order-free sum makes the low bits of the
    entropy vary run-to-run with partitioning. Sorting just the counts
    suffices: equal counts contribute equal summands, so tie order is
    irrelevant. An ANSI oracle reproduces the identical op sequence
    with list_reduce(list_prepend(0.0, list_sort(list(c)))).
    """
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "),
        lambda x: x != F.lit(""),
    )
    counts = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("w"))
        .select("doc_id", F.explode_outer("w").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("w").alias("c"))
    )
    t = F.sum("c")
    # deterministic fold: ((0.0 + c1·ln c1) + c2·ln c2) + … in
    # ascending count order; c = 0 (the explode_outer null row of an
    # empty doc) contributes 0 rather than the 0·ln(0) = NaN trap
    sum_clnc = F.aggregate(
        F.sort_array(F.collect_list(F.col("c").cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc
        + F.when(x > 0, x * F.log(x)).otherwise(F.lit(0.0)),
    )
    h = F.when(
        t > 0, F.log(t.cast("double")) - sum_clnc / t.cast("double")
    ).otherwise(F.lit(0.0))
    nd = F.count(F.col("w"))  # null w (empty doc) not counted
    return counts.groupBy("doc_id").agg(
        F.coalesce(t, F.lit(0)).alias("n_tokens"),
        nd.alias("n_distinct"),
        h.alias("entropy"),
        F.when(nd > 1, h / F.log(nd.cast("double")))
        .otherwise(F.lit(0.0))
        .alias("entropy_ratio"),
    )


def repeated_passages(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    min_chars: int = 20,
    delimiter: str = ". ",
) -> DataFrame:
    """Corpus-level boilerplate mining: sentence-ish passages appearing
    verbatim in many distinct documents (headers, footers, cookie
    banners, license blurbs) — the passage-granular companion to
    document dedup, in the spirit of C4's repeated-three-sentence rule
    (Raffel et al. 2020).

    Passages are the '. '-delimited fragments of the canonical
    normalized text (a literal split — deliberately: it is the one
    sentence rule every engine reproduces bit-identically; RE2-based
    engines have no lookbehind, so no clever regex), kept when at
    least ``min_chars`` long. A passage counts once per document
    (array_distinct before the explode). Returns
    ``(passage, n_docs, first_doc)`` for passages in >= ``min_docs``
    distinct docs — feed the result back as an anti-join or a
    regexp_replace to strip the boilerplate. ``delimiter`` is a LITERAL
    passage separator (regex-quoted on the Spark side so any SQL
    engine's literal string_split reproduces it) — corpora without
    sentence punctuation can delimit on a frequent token instead.

    Scale shape: the only shuffle keys on the passage string (swap in
    xxhash64 for fixed-width keys when passages are long — same
    fingerprint-not-text rule as exact dedup); count + min fuse into
    one aggregation pass.
    """
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    frags = F.array_distinct(
        F.filter(
            F.transform(
                # \Q...\E: java-regex literal quoting of the delimiter
                F.split(
                    normalized_text(F.col(text_col)),
                    "\\Q" + delimiter + "\\E",
                ),
                lambda p: F.trim(p),
            ),
            lambda p: F.length(p) >= min_chars,
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), frags.alias("ps"))
        .select("doc_id", F.explode("ps").alias("passage"))
        .groupBy("passage")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


# ------------------------------------------------------------ PII scrub
#
# Standard training-data release hygiene (the C4 / Gopher / BigScience
# ROOTS pipelines all carry a regex PII pass): emails, IPv4 addresses,
# and long digit runs (phone/account numbers) are replaced with typed
# placeholder tokens. Patterns are deliberately restricted to syntax
# that means THE SAME THING in Java regex (Spark) and RE2 (DuckDB), so
# the DuckDB oracle can mirror the transform verbatim — character
# classes, bounded repetition, and ASCII \b word boundaries only (no
# lookaround, no backreferences).
#
# Order matters and is part of the contract: emails first (an email
# contains digit runs), then IPv4 (dotted digits would otherwise be
# eaten by the digit-run rule), then bare digit runs.

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("digits", r"\b\d{9,}\b", "<NUM>"),
)


def redact_pii(col: Column) -> Column:
    """Chained regexp_replace applying :data:`PII_PATTERNS` in order.
    Pure Column expression — whole-stage codegen, scan-side at 100 TB."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_digits, clean_text): per-doc PII hit
    counts plus the redacted text. Each count is the pattern's match
    count on the ORIGINAL text (a digit run inside an email counts under
    both, though the ordered redaction replaces it once, as <EMAIL>);
    ``all counts == 0  <=>  clean_text == text``."""
    counts = [
        (
            F.size(F.split(F.col(text_col), pat, -1)) - F.lit(1)
        ).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *counts,
        redact_pii(F.col(text_col)).alias("clean_text"),
    )


def redact_pii_sql(expr: str) -> str:
    """The identical transform as ANSI/DuckDB SQL (RE2 'g' flag =
    Spark's replace-all default)."""
    out = expr
    for _, pat, token in PII_PATTERNS:
        # DuckDB strings are escape-free by default: the Java-regex
        # pattern text passes to RE2 verbatim (quotes doubled per ANSI)
        out = (
            f"regexp_replace({out}, '{pat.replace(chr(39), chr(39) * 2)}',"
            f" '{token}', 'g')"
        )
    return out


def remove_passages(
    docs: DataFrame,
    passages: DataFrame,
    delimiter: str = ". ",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_removed, clean_text): strip mined boilerplate
    passages from each document — the REMOVAL half of C4's repeated-
    passage rule (:func:`repeated_passages` is the mining half; feed its
    output straight in as ``passages`` with a ``passage`` column).

    The document's canonical normalized text is split on the same
    literal ``delimiter`` the miner used; fragments whose trimmed form
    matches a mined passage are dropped, the survivors are re-joined
    with the delimiter in original order. ``clean_text`` is the
    canonical (normalized) text — the original column is never mutated
    (the engine's per-turn text-equality invariant), and a document
    whose every fragment is boilerplate comes back with
    ``clean_text = ''``, not a missing row.

    Scale shape: one broadcast left join on the passage key (mined
    boilerplate sets are tiny relative to the corpus) and one hash
    aggregation on the doc id to reassemble — order restored with an
    array_sort over (pos, fragment) structs, no window sort.
    """
    parts = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(
                normalized_text(F.col(text_col)),
                "\\Q" + delimiter + "\\E",
            )
        ).alias("pos", "part"),
    ).withColumn("pkey", F.trim(F.col("part")))
    bp = passages.select(F.col("passage").alias("pkey")).distinct()
    flagged = parts.join(
        F.broadcast(bp.withColumn("is_bp", F.lit(True))), "pkey", "left"
    ).withColumn("is_bp", F.coalesce(F.col("is_bp"), F.lit(False)))
    return flagged.groupBy("doc_id").agg(
        F.count(F.when(F.col("is_bp"), 1)).alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("is_bp"),
                            F.struct("pos", "part"),
                        )
                    )
                ),
                lambda s: s["part"],
            ),
            delimiter,
        ).alias("clean_text"),
    )


def vocabulary_topn(
    docs: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus's top-``n`` whitespace tokens by total occurrence
    count (ties to the lexicographically smallest term — total,
    deterministic order): the fixed-size vocabulary a tokenizer or
    hash-free classifier would be trained with. Plans as
    TakeOrderedAndProject over :func:`term_stats`."""
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    return (
        term_stats(docs, id_col=id_col, text_col=text_col)
        .orderBy(F.desc("total_tf"), F.asc("term"))
        .limit(n)
        .select("term", "total_tf")
    )


def oov_stats(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary profile against a ``(term)``
    vocabulary table: ``(id, n_tokens, n_oov, oov_rate)`` — the
    coverage readout run before committing to a tokenizer vocabulary
    (high OOV rate → wasted UNK mass at training time).

    Every input document appears exactly once; token-less documents
    report ``(0, 0, NULL)`` (no rate is defined). Counts are exact
    int64; the rate is one IEEE division — oracle bit-identical.

    Scale shape: explode → broadcast left join on the term (the
    vocabulary is model-sized) → one hash aggregation keyed on the doc
    id, then a left join back to the doc spine so empty docs survive.
    No shuffle keyed on the term — corpus-hot tokens cannot skew."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("term"),
    ).filter(F.col("term") != "")
    v = vocab.select(F.col("term"), F.lit(1).alias("__in"))
    per_doc = (
        toks.join(F.broadcast(v), "term", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )
    spine = docs.select(F.col(id_col).alias("id"))
    return (
        spine.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_oov").cast("double") / F.col("n_tokens"),
            ),
        )
    )
