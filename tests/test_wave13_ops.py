"""Wave-13: centroid assignment (k-means E-step) and PSI drift."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------- centroid assignment
def test_assign_to_centroids_vs_numpy(spark):
    from parallel_pagerank_spark.functions.similarity import (
        assign_to_centroids,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(60, 8).astype(float)
    cents = rng.randn(4, 8).astype(float)
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cdf = spark.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(cents)],
        "centroid_id long, embedding array<double>",
    )
    got = {
        r["id"]: r["centroid_id"]
        for r in assign_to_centroids(vdf, cdf).collect()
    }
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    cos = vn @ cn.T
    want = {i: int(np.argmax(cos[i])) for i in range(60)}
    assert got == want


def test_assign_to_centroids_lloyd_iteration(spark):
    """assign (E-step) + embedding_centroids (M-step) = one Lloyd
    round: centroids move toward their assigned clusters."""
    from parallel_pagerank_spark.functions.similarity import (
        assign_to_centroids,
        embedding_centroids,
    )

    # two well-separated blobs around +e1 and -e1
    rng = np.random.RandomState(3)
    blob_a = rng.randn(20, 4) * 0.05 + np.array([5.0, 0, 0, 0])
    blob_b = rng.randn(20, 4) * 0.05 + np.array([-5.0, 0, 0, 0])
    vecs = np.vstack([blob_a, blob_b])
    vdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cdf = spark.createDataFrame(
        [(0, [1.0, 0.1, 0.0, 0.0]), (1, [-1.0, 0.1, 0.0, 0.0])],
        "centroid_id long, embedding array<double>",
    )
    assign = assign_to_centroids(vdf, cdf)
    labeled = vdf.join(
        assign.withColumnRenamed("id", "vec_id"), "vec_id"
    ).select("vec_id", "embedding", F.col("centroid_id").alias("label"))
    # perfect separation
    got = {r["vec_id"]: r["label"] for r in labeled.collect()}
    assert all(got[i] == 0 for i in range(20))
    assert all(got[i] == 1 for i in range(20, 40))
    # M-step: dim-0 centroid means land on the blob centers
    cents = {
        (r["group"], r["pos"]): r["centroid_val"]
        for r in embedding_centroids(labeled).collect()
    }
    assert abs(cents[(0, 0)] - 5.0) < 0.1
    assert abs(cents[(1, 0)] + 5.0) < 0.1


# ------------------------------------------------------------ PSI drift
def test_distribution_drift_vs_python(spark):
    from parallel_pagerank_spark.functions.profile import (
        distribution_drift,
    )

    a_vals = [10, 12, 15, 20, 22, 25, 30, 35, 40, 45]
    b_vals = [30, 32, 35, 40, 42, 45, 48, 50, 50, 49, 47]
    a = spark.createDataFrame([(v,) for v in a_vals], "n long")
    b = spark.createDataFrame([(v,) for v in b_vals], "n long")
    B = 5
    out = {r["bucket"]: r for r in distribution_drift(a, b, "n", B).collect()}
    lo, hi = 10, 50
    span = hi - lo + 1

    def bucket(v):
        return (v - lo) * B // span

    ca = [0] * B
    cb = [0] * B
    for v in a_vals:
        ca[bucket(v)] += 1
    for v in b_vals:
        cb[bucket(v)] += 1
    assert set(out) == set(range(B))
    psi = 0.0
    for i in range(B):
        assert out[i]["a_n"] == ca[i]
        assert out[i]["b_n"] == cb[i]
        p = (ca[i] + 0.5) / (len(a_vals) + 0.5 * B)
        q = (cb[i] + 0.5) / (len(b_vals) + 0.5 * B)
        term = (p - q) * math.log(p / q)
        assert abs(out[i]["psi_term"] - term) < 1e-12
        psi += term
    # b is visibly shifted right of a
    assert psi > 0.25


def test_distribution_drift_identical_slices_near_zero(spark):
    from parallel_pagerank_spark.functions.profile import (
        distribution_drift,
    )

    a = spark.range(100).select((F.col("id") % 37).alias("n"))
    out = distribution_drift(a, a, "n", 10).collect()
    assert sum(r["psi_term"] for r in out) == pytest.approx(0.0, abs=1e-12)
    with pytest.raises(ValueError):
        distribution_drift(a, a, "n", 1)


# ------------------------------------------------- leakage-safe splits
def test_leakage_safe_split_clusters_never_straddle(spark):
    from parallel_pagerank_spark.functions.decontam import (
        leakage_safe_split,
    )
    from parallel_pagerank_spark.functions.splits import assign_split

    # 40 genuinely distinct docs (disjoint char-shingle vocabularies —
    # the Jaccard join shingles CHARACTERS, so texts must differ in
    # bulk content, not just a numeral) + two exact-copy families
    uniq = [
        (i, " ".join(f"w{i}q{j}zx{i * 7 + j}ky" for j in range(10)))
        for i in range(40)
    ]
    fam_a = [
        (100 + j, "the quick brown fox jumps over the lazy dog near "
                  "the river bank every single morning")
        for j in range(6)
    ]
    fam_b = [
        (200 + j, "pack my box with five dozen liquor jugs before "
                  "the long journey across the desert")
        for j in range(6)
    ]
    docs = spark.createDataFrame(
        uniq + fam_a + fam_b, "doc_id long, text string"
    )
    out = leakage_safe_split(docs, threshold=0.8)
    rows = {r["doc_id"]: (r["anchor"], r["split"]) for r in out.collect()}
    assert len(rows) == 52
    # every family shares one anchor (= min id) and ONE split
    for base in (100, 200):
        anchors = {rows[base + j][0] for j in range(6)}
        splits_ = {rows[base + j][1] for j in range(6)}
        assert anchors == {base}
        assert len(splits_) == 1
    # unclustered docs anchor to themselves and match plain assign_split
    plain = {
        r["doc_id"]: r["split"]
        for r in assign_split(
            spark.createDataFrame(uniq, "doc_id long, text string")
        ).collect()
    }
    for i, _ in uniq:
        assert rows[i][0] == i
        assert rows[i][1] == plain[i]


def test_leakage_safe_split_non_default_id_col(spark):
    """ADVICE r3: id_col other than "doc_id" must work — the cluster
    re-select previously hardcoded doc_id and raised AnalysisException."""
    from parallel_pagerank_spark.functions.decontam import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [
            (1, "pack my box with five dozen liquor jugs before dawn"),
            (2, "pack my box with five dozen liquor jugs before dawn"),
            (3, "entirely different words about mountains and weather"),
        ],
        "id long, body string",
    )
    out = leakage_safe_split(
        docs, threshold=0.8, id_col="id", text_col="body"
    )
    rows = {r["id"]: (r["anchor"], r["split"]) for r in out.collect()}
    assert rows[1][0] == rows[2][0] == 1
    assert rows[1][1] == rows[2][1]
    assert rows[3][0] == 3


# ------------------------------------------------------------- PII scrub
def test_redact_pii_hand_cases(spark):
    from parallel_pagerank_spark.functions.text import pii_stats

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org please"),
            (2, "server 192.168.1.254 and backup 10.0.0.7"),
            (3, "card 4111111111111111 pin 1234"),
            (4, "clean text with a short 123 number"),
            # email's digits must NOT double-redact; ip inside a
            # sentence; 9-digit boundary case
            (5, "u123456789@x.io then 123456789 then 12345678"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert out[1]["clean_text"] == "mail me at <EMAIL> please"
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 0
    assert out[2]["clean_text"] == "server <IP> and backup <IP>"
    assert out[2]["n_ipv4"] == 2
    assert out[3]["clean_text"] == "card <NUM> pin 1234"
    assert out[3]["n_digits"] == 1
    assert out[4]["clean_text"] == out[4]["clean_text"]
    assert (
        out[4]["n_email"] == out[4]["n_ipv4"] == out[4]["n_digits"] == 0
    )
    assert out[5]["clean_text"] == "<EMAIL> then <NUM> then 12345678"


def test_redact_pii_sql_mirror():
    """The DuckDB-side chain produces the identical cleaned string on
    adversarial inputs (dialect-portability contract of PII_PATTERNS)."""
    import duckdb

    from parallel_pagerank_spark.functions.text import redact_pii_sql

    cases = [
        "mail jane.doe+x@sub.example.org or 10.0.0.7 acct 999888777666",
        "no pii here",
        "edge 1.2.3.4.5 and 255.255.255.255",
        "a@b.co x@y.museum 1234567890123456789",
    ]
    expr = redact_pii_sql("s")
    for s in cases:
        got = duckdb.sql(
            f"SELECT {expr} FROM (SELECT '{s}' AS s)"
        ).fetchone()[0]
        import re

        want = s
        from parallel_pagerank_spark.functions.text import PII_PATTERNS

        for _, pat, token in PII_PATTERNS:
            want = re.sub(pat, token, want)
        assert got == want, (s, got, want)
