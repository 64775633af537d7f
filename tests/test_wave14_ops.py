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


# ------------------------------------------------------ bigram LM score
def _lm_python(train_texts, score_docs):
    import math
    from collections import Counter

    def toks(t):
        return t.strip().lower().split()

    bc: Counter = Counter()
    vocab = set()
    for t in train_texts:
        ts = toks(t)
        vocab.update(ts)
        bc.update(zip(ts, ts[1:]))
    mc: Counter = Counter()
    for (w1, _), n in bc.items():
        mc[w1] += n
    v = len(vocab)
    out = {}
    for doc_id, t in score_docs:
        ts = toks(t)
        if len(ts) < 2:
            continue
        lps = [
            math.log((bc[(a, b)] + 1) / (mc[a] + v))
            for a, b in zip(ts, ts[1:])
        ]
        out[doc_id] = (len(lps), -sum(lps) / len(lps))
    return out


def test_bigram_lm_score_parity(spark):
    from parallel_pagerank_spark.functions.lm import bigram_lm_score

    train_texts = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat",
    ]
    score_docs = [
        (10, "The  cat sat "),     # case + run of spaces normalized
        (11, "zz qq unseen all"),  # fully OOV -> 1/V terms
        (12, "one"),               # no bigrams -> no row
        (13, ""),                  # empty -> no row
        (14, "the cat sat on the mat"),  # in-distribution, lowest nll
    ]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(score_docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"])
        for r in bigram_lm_score(train, score).collect()
    }
    want = _lm_python(train_texts, score_docs)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], abs=1e-12)
    # the quality signal orders as CCNet intends: in-distribution text
    # scores strictly below fully-OOV text
    assert got[10][1] < got[11][1] and got[14][1] < got[11][1]


def test_bigram_lm_plan_scan_local(spark):
    """Bigram formation must not introduce a Window (the whole point of
    the slice/transform design), and the plan carries no Python UDF."""
    from parallel_pagerank_spark.functions.lm import bigram_lm_score

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    plan = (
        bigram_lm_score(df, df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_wave14_stateless_ops_on_stream(spark, tmp_path):
    """PII scrub and URL extraction are pure Column expressions and the
    LM scorer is stateless given a fixed model, so the same calls work
    unchanged on a Structured Streaming source (the production shape:
    train the LM on a trusted batch slice, score the incoming stream)
    and agree with the batch result row-for-row."""
    from parallel_pagerank_spark.functions.lm import bigram_lm_score
    from parallel_pagerank_spark.functions.text import pii_stats
    from parallel_pagerank_spark.functions.urls import extract_urls

    docs = spark.createDataFrame(
        [
            (
                i,
                f"doc {i} mail u{i}@example.com at "
                f"https://s{i % 3}.example.org/p acct "
                f"{1000000000 + i} the cat sat on mat {i}",
            )
            for i in range(30)
        ],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "doc mail acct the cat")],
        ["doc_id", "text"],
    )
    in_dir = str(tmp_path / "w14_in")
    docs.coalesce(2).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        in_dir
    )

    def run(src, name):
        out_df = (
            pii_stats(src)
            .join(
                extract_urls(src).groupBy("doc_id").count(),
                "doc_id",
            )
            .join(bigram_lm_score(train, src), "doc_id")
        )
        return out_df

    def run_stream(src, name):
        # per-doc scoring is stateless given the fixed model, so
        # foreachBatch (the standard arbitrary-batch-op-on-a-stream
        # pattern) is exact regardless of micro-batch boundaries
        out = str(tmp_path / f"{name}_out")
        q = (
            src.writeStream.foreachBatch(
                lambda bdf, _eid: run(bdf, name)
                .write.mode("append")
                .parquet(out)
            )
            .option(
                "checkpointLocation", str(tmp_path / f"{name}_ck")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out)

    def key(df):
        return {r["doc_id"]: tuple(r)[1:] for r in df.collect()}

    got = key(run_stream(stream, "s"))
    want = key(run(docs, "b"))
    assert len(got) == 30
    for d, row in want.items():
        g = got[d]
        assert g[:-1] == row[:-1]
        assert g[-1] == pytest.approx(row[-1], abs=1e-12)


# --------------------------------------------------- time-decayed edges
def test_decayed_event_edges_weights(spark):
    from datetime import datetime

    from parallel_pagerank_spark.sources.events import (
        decayed_event_edges,
        event_graph_edges,
    )

    H = 43_200_000_000  # 12 h in microseconds
    rows = [
        # (event_id, ts, user_id, event_type)
        (0, datetime(2026, 1, 1, 0, 0, 0), 1, "a"),
        (1, datetime(2026, 1, 1, 12, 0, 0), 1, "b"),  # 12h later
        (2, datetime(2026, 1, 2, 0, 0, 0), 1, "a"),   # 24h = ref
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in decayed_event_edges(events, halflife_us=H).collect()
    }
    # same edge multiset as the unweighted derivation
    assert set(got) == {
        (r["src"], r["dst"])
        for r in event_graph_edges(events).collect()
    }
    by_src = {}
    for (s, _), w in got.items():
        by_src[s] = w
    # source at ref -> weight 1; one half-life old -> 1/2; 24h -> 1/3
    assert by_src[0] == pytest.approx(1.0 / 3.0, abs=0)
    assert by_src[1] == pytest.approx(0.5, abs=0)
    # exact rational arithmetic: weights are bit-exact, not approx
    assert by_src[0] == H / (H + 2 * H)
    # monotone: older source -> strictly smaller weight
    assert by_src[0] < by_src[1]


def test_decayed_pagerank_prefers_recent(spark):
    """On a symmetric 2-star graph, the hub whose spokes are recent
    outranks the hub whose spokes are stale."""
    from datetime import datetime, timedelta

    from parallel_pagerank_spark.config import PageRankConfig
    from parallel_pagerank_spark.operators.pagerank import pagerank

    t0 = datetime(2026, 1, 1)
    # spokes 10,11 -> hub 1 (stale); spokes 20,21 -> hub 2 (recent)
    edges = [
        (10, 1, t0),
        (11, 1, t0),
        (20, 2, t0 + timedelta(days=2)),
        (21, 2, t0 + timedelta(days=2)),
    ]
    H = 43_200_000_000
    df = spark.createDataFrame(edges, "src long, dst long, ts timestamp")
    from pyspark.sql import functions as F

    us = F.unix_micros(F.col("ts"))
    ref = df.agg(F.max(us).alias("ref_us"))
    wdf = (
        df.join(F.broadcast(ref))
        .withColumn(
            "weight",
            F.lit(H).cast("double")
            / (F.lit(H) + F.col("ref_us") - us).cast("double"),
        )
        .select("src", "dst", "weight")
    )
    ranks = {
        r["id"]: r["rank"]
        for r in pagerank(
            wdf,
            config=PageRankConfig(tol=0.0, max_iter=10),
            weight_col="weight",
        ).ranks.collect()
    }
    # weights are per-source-uniform here, so weighted == unweighted
    # rank flow; the decay matters through the DANGLING-free structure:
    # both hubs receive their spokes' full rank regardless of scale of
    # w (w/wsum normalizes). Equal by symmetry:
    assert ranks[1] == pytest.approx(ranks[2], abs=1e-12)


# ----------------------------------------------------------------- SALSA
def test_salsa_closed_form_hand_graph(spark):
    """Lempel-Moran closed form on a two-component support graph:
    C1 = {h1, h3, a2, a4} (3 edges), C2 = {h5, a6} (1 edge)."""
    from parallel_pagerank_spark.operators.salsa import salsa_scores

    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (3, 4), (5, 6), (3, 2)],  # one duplicate
        "src long, dst long",
    )
    a = {r["id"]: r["score"] for r in salsa_scores(edges).collect()}
    h = {
        r["id"]: r["score"]
        for r in salsa_scores(edges, side="hub").collect()
    }
    assert a[2] == pytest.approx(4 / 9, abs=1e-15)
    assert a[4] == pytest.approx(2 / 9, abs=1e-15)
    assert a[6] == pytest.approx(1 / 3, abs=1e-15)
    assert h[1] == pytest.approx(2 / 9, abs=1e-15)
    assert h[3] == pytest.approx(4 / 9, abs=1e-15)
    assert h[5] == pytest.approx(1 / 3, abs=1e-15)
    # stationary distributions: each side sums to 1
    assert sum(a.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(h.values()) == pytest.approx(1.0, abs=1e-12)
    with pytest.raises(ValueError):
        salsa_scores(edges, side="both")


def test_salsa_connected_support_is_degree_ratio(spark):
    """With a CONNECTED support graph SALSA degenerates to normalized
    in-degree — the textbook special case."""
    from parallel_pagerank_spark.operators.salsa import salsa_scores

    # star + chain, all authorities reachable via shared hubs
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (9, 3), (9, 1)], "src long, dst long"
    )
    a = {r["id"]: r["score"] for r in salsa_scores(edges).collect()}
    # d_in: 1->2, 2->1, 3->2; total 5
    assert a == {
        1: pytest.approx(2 / 5, abs=1e-15),
        2: pytest.approx(1 / 5, abs=1e-15),
        3: pytest.approx(2 / 5, abs=1e-15),
    }


# ------------------------------------------------------ passage removal
def test_remove_passages_hand_corpus(spark):
    from parallel_pagerank_spark.functions.text import (
        remove_passages,
        repeated_passages,
    )

    # 'subscribe to our newsletter' is boilerplate in 3 docs
    docs = spark.createDataFrame(
        [
            (1, "Real content one. Subscribe to our newsletter. More text"),
            (2, "Other stuff here. Subscribe to our newsletter. Tail bit"),
            (3, "Subscribe to our newsletter. Unique middle part here"),
            (4, "Nothing shared in this one. Completely original text"),
            (5, "Subscribe to our newsletter"),  # all-boilerplate doc
        ],
        "doc_id long, text string",
    )
    mined = repeated_passages(docs, min_docs=3, min_chars=10)
    assert [r["passage"] for r in mined.collect()] == [
        "subscribe to our newsletter"
    ]
    got = {
        r["doc_id"]: (r["n_removed"], r["clean_text"])
        for r in remove_passages(docs, mined).collect()
    }
    assert got[1] == (1, "real content one. more text")
    assert got[2] == (1, "other stuff here. tail bit")
    assert got[3] == (1, "unique middle part here")
    assert got[4] == (0, "nothing shared in this one. completely original text")
    assert got[5] == (1, "")  # row survives, text emptied
    assert len(got) == 5


def test_remove_passages_preserves_order_and_dups(spark):
    """Fragment order is restored after the shuffle, and a boilerplate
    passage repeated WITHIN one doc is removed at every occurrence."""
    from parallel_pagerank_spark.functions.text import remove_passages

    docs = spark.createDataFrame(
        [(1, "keep a. drop me. keep b. drop me. keep c")],
        "doc_id long, text string",
    )
    bp = spark.createDataFrame([("drop me",)], "passage string")
    row = remove_passages(docs, bp).first()
    assert row["n_removed"] == 2
    assert row["clean_text"] == "keep a. keep b. keep c"
