"""Wave-17 operators: URL canonicalization / URL-level dedup and the
count-ratio linear quality classifier."""

from __future__ import annotations

import pytest


MESSY = [
    # (doc_id, raw url, expected canonical)
    (1, "https://WWW.Site7.Example.COM:443/page7/", "https://site7.example.com/page7"),
    (2, "https://site2.example.com/page2?utm_source=feed2", "https://site2.example.com/page2"),
    (3, "https://site3.example.com/page3#sec3", "https://site3.example.com/page3"),
    (4, "https://site4.example.com/page4/?utm_campaign=a&ref=r", "https://site4.example.com/page4"),
    (5, "https://site0.example.com/page0", "https://site0.example.com/page0"),
    (6, "http://host.example:80/a", "http://host.example/a"),
    (7, "http://host.example:8080/a", "http://host.example:8080/a"),
    (8, "https://h.example/a?keep=1&utm_medium=m&also=2", "https://h.example/a?keep=1&also=2"),
    (9, "https://h.example/a?utm_medium=m&keep=1", "https://h.example/a?keep=1"),
    (10, "https://h.example/Path/UPPER", "https://h.example/Path/UPPER"),
    (11, "https://h.example/", "https://h.example"),
    (12, "https://h.example/a?gclid=xyz", "https://h.example/a"),
]


def test_canonical_url_variants(spark):
    from parallel_pagerank_spark.functions.urls import canonical_url
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, u) for i, u, _ in MESSY], "doc_id long, url string"
    )
    got = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, _, want in MESSY:
        assert got[i] == want, f"doc {i}: {got[i]!r} != {want!r}"


def test_url_dedup_collapses_variants(spark):
    from parallel_pagerank_spark.functions.urls import url_dedup

    # five mess variants of ONE page + one distinct page, with doc 4
    # mentioning the shared page twice (n_occ counts mentions).
    docs = spark.createDataFrame(
        [
            (1, "see https://WWW.Site7.Example.COM:443/page7/"),
            (2, "see https://site7.example.com/page7?utm_source=f"),
            (3, "see https://site7.example.com/page7#frag"),
            (4, "see https://site7.example.com/page7/ and https://site7.example.com/page7"),
            (5, "see https://other.example.com/x"),
        ],
        "doc_id long, text string",
    )
    rows = {r["canonical"]: r for r in url_dedup(docs).collect()}
    assert set(rows) == {
        "https://site7.example.com/page7",
        "https://other.example.com/x",
    }
    shared = rows["https://site7.example.com/page7"]
    assert shared["keep_id"] == 1
    assert shared["n_docs"] == 4
    assert shared["n_occ"] == 5
    other = rows["https://other.example.com/x"]
    assert (other["keep_id"], other["n_docs"], other["n_occ"]) == (5, 1, 1)


CLS_DOCS = [
    # positives: "good" appears 3x total, "fine" 1x; negatives: "bad" 2x.
    (1, True, "good good fine"),
    (2, True, "good shared"),
    (3, False, "bad shared"),
    (4, False, "bad"),
]


@pytest.fixture()
def cls_df(spark):
    return spark.createDataFrame(
        CLS_DOCS, "doc_id long, label boolean, text string"
    )


def test_train_count_classifier_exact_weights(spark, cls_df):
    from parallel_pagerank_spark.functions.classify import (
        train_count_classifier,
    )

    # N_pos = 5 tokens (good good fine / good shared), N_neg = 3.
    model = {
        r["term"]: (r["c_pos"], r["c_neg"], r["weight"])
        for r in train_count_classifier(cls_df).collect()
    }
    assert model["good"] == (3, 0, 3 * 3 - 0 * 5)  # 9
    assert model["bad"] == (0, 2, 0 * 3 - 2 * 5)  # -10
    assert model["fine"] == (1, 0, 3)
    assert model["shared"] == (1, 1, 1 * 3 - 1 * 5)  # -2: rarer per-token in pos


def test_train_balanced_weights(spark, cls_df):
    from parallel_pagerank_spark.functions.classify import (
        train_count_classifier,
    )

    model = {
        r["term"]: r["weight"]
        for r in train_count_classifier(cls_df, balanced=True).collect()
    }
    assert model == {"good": 3, "bad": -2, "fine": 1, "shared": 0}


def test_score_documents_exact_and_total(spark, cls_df):
    from parallel_pagerank_spark.functions.classify import (
        score_documents,
        train_count_classifier,
    )

    model = train_count_classifier(cls_df)
    corpus = spark.createDataFrame(
        [
            (10, "good good bad"),  # 9+9-10 = 8
            (11, "unseen words only"),  # fully OOV -> 0, n_toks 3
            (12, ""),  # token-less -> 0, n_toks 0
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in score_documents(corpus, model).collect()}
    assert set(rows) == {10, 11, 12}, "every input doc gets a row"
    assert (rows[10]["score"], rows[10]["n_toks"]) == (8, 3)
    assert (rows[11]["score"], rows[11]["n_toks"]) == (0, 3)
    assert (rows[12]["score"], rows[12]["n_toks"]) == (0, 0)


def test_classifier_filter_threshold(spark, cls_df):
    from parallel_pagerank_spark.functions.classify import (
        classifier_filter,
        train_count_classifier,
    )

    model = train_count_classifier(cls_df)
    corpus = spark.createDataFrame(
        [
            (10, "good good bad"),  # 8 > 0: kept
            (11, "bad bad"),  # -20: dropped
            (12, "oov only"),  # 0: dropped (strict >)
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in classifier_filter(corpus, model).collect()
    )
    assert kept == [10]
    # schema preserved
    assert classifier_filter(corpus, model).columns == corpus.columns
