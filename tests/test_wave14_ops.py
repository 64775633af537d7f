"""Wave-14 operators: URL/domain curation pass (+ LM scoring tests live
here as the wave grows)."""

from __future__ import annotations

import pytest


DOCS = [
    (1, "read https://News.Example.COM/a/b?x=1 and http://news.example.com"),
    (2, "mirror http://cdn.example.net:8080/static plus plain text"),
    (3, "no links at all"),
    (4, "dup https://news.example.com/x https://news.example.com/x"),
    (5, "bare host https://spam.example"),
]


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_extract_urls_and_domains(spark, docs_df):
    from parallel_pagerank_spark.functions.urls import extract_urls

    rows = extract_urls(docs_df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["url"], r["domain"]))
    # mixed-case host lowercased; query string kept in url, not domain
    assert by_doc[1][0] == (
        "https://News.Example.COM/a/b?x=1",
        "news.example.com",
    )
    assert by_doc[1][1] == ("http://news.example.com", "news.example.com")
    # port stripped from domain, kept in url
    assert by_doc[2] == [
        ("http://cdn.example.net:8080/static", "cdn.example.net")
    ]
    assert 3 not in by_doc  # no URLs -> no rows
    assert len(by_doc[4]) == 2  # duplicate mentions kept


def test_domain_stats(spark, docs_df):
    from parallel_pagerank_spark.functions.urls import domain_stats

    got = {
        r["domain"]: (r["n_urls"], r["n_docs"])
        for r in domain_stats(docs_df).collect()
    }
    assert got["news.example.com"] == (4, 2)  # docs 1 (x2) and 4 (x2)
    assert got["cdn.example.net"] == (1, 1)
    assert got["spam.example"] == (1, 1)


def test_filter_blocked_domains(spark, docs_df):
    from parallel_pagerank_spark.functions.urls import (
        filter_blocked_domains,
    )

    # iterable form, mixed case on BOTH sides of the match
    kept = filter_blocked_domains(
        docs_df, ["NEWS.example.com", "spam.example"]
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    assert kept.columns == docs_df.columns  # schema preserved
    # DataFrame form
    bl = spark.createDataFrame([("cdn.EXAMPLE.net",)], "domain string")
    kept2 = filter_blocked_domains(docs_df, bl)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [1, 3, 4, 5]
    # empty blocklist keeps everything
    kept3 = filter_blocked_domains(
        docs_df, spark.createDataFrame([], "domain string")
    )
    assert kept3.count() == len(DOCS)


def test_filter_blocked_broadcasts(spark, docs_df):
    """The blocklist side of the semi-join must be broadcast — the plan
    may not shuffle the corpus for a tiny dimension table."""
    from parallel_pagerank_spark.functions.urls import (
        filter_blocked_domains,
    )

    plan = filter_blocked_domains(
        docs_df, ["spam.example"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "BroadcastNestedLoop" not in plan  # never a cartesian
