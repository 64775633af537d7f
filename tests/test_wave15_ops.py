"""Wave-15 operators: sequence-level duplicate-span dedup (Lee et al.
ACL'22 exact-substring rule at k-token granularity) — mine + scrub."""

from __future__ import annotations

import pytest


# A shared 6-token phrase in docs 1/2/4 (doc 4 = exact copy of doc 1),
# an overlapping repeat inside doc 5, a short doc, an empty doc.
SPAN_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta unique one"),
    (2, "Prefix alpha beta gamma delta epsilon zeta tail two"),
    (3, "totally different words with no repeats anywhere at all"),
    (4, "alpha beta gamma delta epsilon zeta eta unique one"),
    (5, "x p q r s t u p q r s t u y"),
    (6, "too short"),
    (7, ""),
]


def _py_tokens(text):
    return [w for w in text.lower().split() if w]


def _py_spans(docs, k):
    out = []
    for doc_id, text in docs:
        toks = _py_tokens(text)
        for i in range(len(toks) - k + 1):
            out.append((doc_id, i + 1, " ".join(toks[i : i + k])))
    return out


def _py_duplicates(docs, k, min_docs):
    spans = _py_spans(docs, k)
    by_span = {}
    for doc_id, _, s in spans:
        d = by_span.setdefault(s, {"docs": set(), "n": 0})
        d["docs"].add(doc_id)
        d["n"] += 1
    return {
        s: (len(d["docs"]), d["n"])
        for s, d in by_span.items()
        if len(d["docs"]) >= min_docs
    }


def _py_scrub(docs, k, min_docs):
    dups = _py_duplicates(docs, k, min_docs)
    out = {}
    for doc_id, text in docs:
        toks = _py_tokens(text)
        covered = set()
        for i in range(len(toks) - k + 1):
            if " ".join(toks[i : i + k]) in dups:
                covered.update(range(i, i + k))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        out[doc_id] = (len(toks), len(covered), " ".join(kept))
    return out


@pytest.fixture()
def span_docs(spark):
    return spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")


def test_duplicate_spans_matches_python_oracle(spark, span_docs):
    from parallel_pagerank_spark.functions.spans import duplicate_spans

    got = {
        r["span"]: (r["n_docs"], r["n_occ"])
        for r in duplicate_spans(span_docs, k=6, min_docs=2).collect()
    }
    assert got == _py_duplicates(SPAN_DOCS, 6, 2)
    # the shared phrase is found across docs 1/2/4
    assert got["alpha beta gamma delta epsilon zeta"] == (3, 3)


def test_duplicate_spans_within_one_doc_needs_min_docs_1(spark):
    """Doc 5 repeats 'p q r s t u' twice WITHIN itself: min_docs=2
    misses it (1 distinct doc), min_docs=1 with n_occ>=2 catches it."""
    from parallel_pagerank_spark.functions.spans import duplicate_spans

    docs = spark.createDataFrame(SPAN_DOCS, "doc_id long, text string")
    two_docs = duplicate_spans(docs, k=6, min_docs=2)
    assert (
        two_docs.filter("span = 'p q r s t u'").count() == 0
    )
    within = duplicate_spans(docs, k=6, min_docs=1).filter(
        "span = 'p q r s t u' and n_occ >= 2"
    )
    assert within.collect()[0]["n_occ"] == 2


def test_remove_duplicate_spans_matches_python_oracle(spark, span_docs):
    from parallel_pagerank_spark.functions.spans import remove_duplicate_spans

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in remove_duplicate_spans(span_docs, k=6, min_docs=2).collect()
    }
    assert got == _py_scrub(SPAN_DOCS, 6, 2)
    # every doc comes back exactly once, including empty + short docs
    assert set(got) == {d for d, _ in SPAN_DOCS}
    # exact-copy docs 1 and 4: every window duplicated -> all 9 tokens
    # covered (overlapping windows merge), clean_text = ''
    assert got[1] == (9, 9, "")
    assert got[4] == (9, 9, "")
    # doc 2 keeps its unique prefix/suffix tokens
    assert got[2][2] == "prefix tail two"
    # untouched docs: zero removed, canonical text survives
    assert got[3][1] == 0
    assert got[7] == (0, 0, "")


def test_remove_accepts_premined_spans(spark, span_docs):
    """A pre-filtered mined frame drives the scrub (the mine->inspect->
    scrub workflow); only the supplied spans are struck."""
    from parallel_pagerank_spark.functions.spans import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    mined = duplicate_spans(span_docs, k=6, min_docs=2).filter(
        "span = 'alpha beta gamma delta epsilon zeta'"
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_spans(span_docs, mined, k=6).collect()
    }
    assert got[1] == "eta unique one"
    assert got[2] == "prefix tail two"
    assert got[5] == "x p q r s t u p q r s t u y".lower()


# --------------------------------------------- neighborhood-Jaccard linkpred

LP_EDGES = [
    (1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (5, 1),
    (2, 2),          # self-loop: ignored
    (3, 2),          # reverse duplicate: neighborhoods are undirected sets
]


def _py_jaccard(edges, exclude_existing=True, min_common=1):
    nbrs: dict[int, set[int]] = {}
    adj = set()
    for s, t in edges:
        if s == t:
            continue
        nbrs.setdefault(s, set()).add(t)
        nbrs.setdefault(t, set()).add(s)
        adj.add((min(s, t), max(s, t)))
    out = {}
    ids = sorted(nbrs)
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            c = len(nbrs[u] & nbrs[v])
            if c < min_common:
                continue
            if exclude_existing and (u, v) in adj:
                continue
            out[(u, v)] = (c, c / (len(nbrs[u]) + len(nbrs[v]) - c))
    return out


def test_jaccard_linkpred_matches_python_oracle(spark):
    from parallel_pagerank_spark.operators.linkanalysis import (
        jaccard_linkpred,
    )
    from tests.conftest import edges_df

    got = {
        (r["u"], r["v"]): (r["n_common"], r["jaccard"])
        for r in jaccard_linkpred(edges_df(spark, LP_EDGES)).collect()
    }
    exp = _py_jaccard(LP_EDGES)
    assert set(got) == set(exp)
    for k, (c, j) in exp.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(j, abs=1e-12)
    # adjacent pairs excluded in the prediction setting
    assert (1, 2) not in got and (3, 4) not in got


def test_jaccard_linkpred_include_existing(spark):
    from parallel_pagerank_spark.operators.linkanalysis import (
        jaccard_linkpred,
    )
    from tests.conftest import edges_df

    got = {
        (r["u"], r["v"]): (r["n_common"], r["jaccard"])
        for r in jaccard_linkpred(
            edges_df(spark, LP_EDGES), exclude_existing=False
        ).collect()
    }
    exp = _py_jaccard(LP_EDGES, exclude_existing=False)
    assert set(got) == set(exp)
    # hand check: N(1)={2,3,5}, N(2)={1,3} -> common={3},
    # J = 1 / (3 + 2 - 1) = 0.25
    assert got[(1, 2)] == (1, pytest.approx(0.25))


def test_jaccard_linkpred_degree_cap_is_lower_bound(spark):
    """With the shared star-center capped out of pair generation, its
    leaves lose that common neighbor: fewer/lower scores, never more."""
    from parallel_pagerank_spark.operators.linkanalysis import (
        jaccard_linkpred,
    )
    from tests.conftest import edges_df

    star = [(100, i) for i in range(1, 8)] + [(1, 2)]
    full = {
        (r["u"], r["v"]): r["jaccard"]
        for r in jaccard_linkpred(
            edges_df(spark, star), exclude_existing=False
        ).collect()
    }
    capped = {
        (r["u"], r["v"]): r["jaccard"]
        for r in jaccard_linkpred(
            edges_df(spark, star), degree_cap=5, exclude_existing=False
        ).collect()
    }
    assert set(capped) <= set(full)
    for k, j in capped.items():
        assert j <= full[k] + 1e-12


def test_spans_validation(spark, span_docs):
    from parallel_pagerank_spark.functions.spans import (
        duplicate_spans,
        token_spans,
    )

    with pytest.raises(ValueError):
        token_spans(span_docs, k=0)
    with pytest.raises(ValueError):
        duplicate_spans(span_docs, min_docs=0)


# ---------------------------------------------------------------------------
# Sequence packing (functions/packing.py): concat-then-chunk slice map +
# materialized sequences vs a sequential python oracle.
# ---------------------------------------------------------------------------

PACK_DOCS = [
    (10, "alpha beta gamma delta"),
    (11, ""),
    (12, "one two three four five six seven eight nine ten"),
    (13, "tail"),
    (14, "Mixed   Case\twhitespace  run"),
]

EOS = "<eos>"


def _py_pack_map(docs, L):
    rows, g = [], 0
    for doc_id, text in sorted(docs):
        n = len(_py_tokens(text)) + 1  # + EOS
        s = g // L
        while s * L < g + n:
            lo, hi = max(g, s * L), min(g + n, (s + 1) * L)
            rows.append((s, doc_id, lo - g + 1, lo - s * L, hi - lo))
            s += 1
        g += n
    return sorted(rows)


def _py_pack_text(docs, L):
    stream = []
    for _, text in sorted(docs):
        stream.extend(_py_tokens(text) + [EOS])
    out = []
    for s in range(0, (len(stream) + L - 1) // L):
        chunk = stream[s * L : (s + 1) * L]
        out.append((s, len(chunk), " ".join(chunk)))
    return sorted(out)


@pytest.fixture()
def pack_docs(spark):
    return spark.createDataFrame(PACK_DOCS, "doc_id long, text string")


@pytest.mark.parametrize("L", [1, 4, 7, 64])
def test_pack_sequences_vs_python(spark, pack_docs, L):
    from parallel_pagerank_spark.functions.packing import pack_sequences

    got = sorted(
        (r["seq_id"], r["doc_id"], r["tok_start"], r["seq_pos"], r["slice_len"])
        for r in pack_sequences(pack_docs, seq_len=L).collect()
    )
    assert got == _py_pack_map(PACK_DOCS, L)


def test_pack_sequences_invariants(spark, pack_docs):
    from parallel_pagerank_spark.functions.packing import pack_sequences

    L = 5
    rows = pack_sequences(pack_docs, seq_len=L).collect()
    total = sum(len(_py_tokens(t)) + 1 for _, t in PACK_DOCS)
    # every sequence is exactly full except possibly the last
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], 0)
        by_seq[r["seq_id"]] += r["slice_len"]
    last = max(by_seq)
    assert set(by_seq) == set(range(last + 1))  # contiguous ids from 0
    for s, n in by_seq.items():
        assert n == (L if s < last else total - last * L)
    # every doc's slices partition 1..n_tok+1
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["tok_start"], r["slice_len"])
        )
    for doc_id, text in PACK_DOCS:
        pieces = sorted(by_doc[doc_id])
        expect_start = 1
        for start, ln in pieces:
            assert start == expect_start
            expect_start += ln
        assert expect_start - 1 == len(_py_tokens(text)) + 1


@pytest.mark.parametrize("L", [3, 6, 64])
def test_pack_sequence_text_vs_python(spark, pack_docs, L):
    from parallel_pagerank_spark.functions.packing import pack_sequence_text

    got = sorted(
        (r["seq_id"], r["n_tokens"], r["seq_text"])
        for r in pack_sequence_text(pack_docs, seq_len=L).collect()
    )
    assert got == _py_pack_text(PACK_DOCS, L)


def test_pack_drop_last(spark, pack_docs):
    from parallel_pagerank_spark.functions.packing import (
        pack_sequence_text,
        pack_sequences,
    )

    L = 5
    total = sum(len(_py_tokens(t)) + 1 for _, t in PACK_DOCS)
    n_full = total // L
    kept = pack_sequences(pack_docs, seq_len=L, drop_last=True)
    assert set(r["seq_id"] for r in kept.collect()) == set(range(n_full))
    txt = pack_sequence_text(pack_docs, seq_len=L, drop_last=True).collect()
    assert all(r["n_tokens"] == L for r in txt)


def test_pack_deterministic_under_repartition(spark, pack_docs):
    from parallel_pagerank_spark.functions.packing import pack_sequences

    a = sorted(map(tuple, pack_sequences(pack_docs, seq_len=4).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(pack_docs.repartition(7), seq_len=4).collect(),
        )
    )
    assert a == b


def test_pack_validation(spark, pack_docs):
    from parallel_pagerank_spark.functions.packing import pack_sequences

    with pytest.raises(ValueError):
        pack_sequences(pack_docs, seq_len=0)


# ---------------------------------------------------------------------------
# BM25 (functions/text.py bm25) vs hand math.
# ---------------------------------------------------------------------------

BM_DOCS = [
    (1, "apple banana apple cherry"),
    (2, "banana banana banana"),
    (3, "cherry date elderberry fig grape"),
    (4, ""),
]


def _py_bm25(docs, k1=1.2, b=0.75):
    import math
    from collections import Counter

    per = {
        d: Counter(_py_tokens(t)) for d, t in docs if _py_tokens(t)
    }
    n = len(per)
    avgdl = sum(sum(c.values()) for c in per.values()) / n
    df = Counter()
    for c in per.values():
        df.update(c.keys())
    out = {}
    for d, c in per.items():
        dl = sum(c.values())
        for t, tf in c.items():
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            out[(d, t)] = (
                idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            )
    return out


@pytest.mark.parametrize("k1,b", [(1.2, 0.75), (2.0, 0.0), (0.0, 1.0)])
def test_bm25_vs_python(spark, k1, b):
    from parallel_pagerank_spark.functions.text import bm25

    docs = spark.createDataFrame(BM_DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"]): r["bm25"]
        for r in bm25(docs, k1=k1, b=b).collect()
    }
    want = _py_bm25(BM_DOCS, k1=k1, b=b)
    assert set(got) == set(want)
    for key, v in want.items():
        assert got[key] == pytest.approx(v, abs=1e-12)


def test_bm25_properties(spark):
    from parallel_pagerank_spark.functions.text import bm25

    docs = spark.createDataFrame(BM_DOCS, "doc_id long, text string")
    rows = {(r["doc_id"], r["term"]): r for r in bm25(docs).collect()}
    # empty doc contributes nothing
    assert not any(d == 4 for d, _ in rows)
    # dl carried correctly through the aggregation
    assert rows[(1, "apple")]["dl"] == 4 and rows[(2, "banana")]["dl"] == 3
    # rarer term outscores a common one at equal tf within the same doc
    assert rows[(3, "date")]["bm25"] == rows[(3, "fig")]["bm25"]
    assert rows[(1, "cherry")]["bm25"] < rows[(1, "apple")]["bm25"]


def test_bm25_validation(spark):
    from parallel_pagerank_spark.functions.text import bm25

    docs = spark.createDataFrame(BM_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25(docs, k1=-0.1)
    with pytest.raises(ValueError):
        bm25(docs, b=1.5)


# ---------------------------------------------------------------------------
# Source-mixture scheduling (functions/mixing.py) vs the portable-hash
# python oracle.
# ---------------------------------------------------------------------------

_P, _K, _M = 2_147_483_647, 2_654_435_761, 4_294_967_296
_STRIDE = 1_000_003

MIX_DOCS = [(i, f"doc {i}", ["a", "b", "c", "d"][i % 4]) for i in range(40)]
MIX_W = {"a": 2.5, "b": 1.0, "c": 0.25}  # d unlisted -> dropped


def _bucket(x, salt=0):
    return ((x + salt) % _P) * _K % _M


def _py_mixture(docs, weights, salt=0):
    rows = []
    for doc_id, _, src in docs:
        if src not in weights:
            continue
        w = weights[src]
        k = int(w) + (1 if _bucket(doc_id, salt) < (w - int(w)) * _M else 0)
        for e in range(k):
            rows.append(
                (doc_id, src, e, _bucket(doc_id + e * _STRIDE, salt))
            )
    return sorted(rows)


@pytest.fixture()
def mix_docs(spark):
    return spark.createDataFrame(
        MIX_DOCS, "doc_id long, text string, source string"
    )


@pytest.mark.parametrize("salt", [0, 7])
def test_mixture_vs_python(spark, mix_docs, salt):
    from parallel_pagerank_spark.functions.mixing import mixture_schedule

    got = sorted(
        map(tuple, mixture_schedule(mix_docs, MIX_W, salt=salt).collect())
    )
    assert got == _py_mixture(MIX_DOCS, MIX_W, salt=salt)


def test_mixture_semantics(spark, mix_docs):
    from parallel_pagerank_spark.functions.mixing import mixture_schedule

    rows = mixture_schedule(mix_docs, MIX_W).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert "d" not in by_src  # fail-closed
    # every 'b' doc exactly once, epoch 0
    assert len(by_src["b"]) == 10
    assert all(r["epoch"] == 0 for r in by_src["b"])
    # every 'a' doc 2 or 3 times with contiguous epochs from 0
    per_doc = {}
    for r in by_src["a"]:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    for eps in per_doc.values():
        assert sorted(eps) == list(range(len(eps))) and len(eps) in (2, 3)
    # 'c' at 0.25: a strict stable subset appears exactly once
    assert 0 < len(by_src["c"]) < 10


def test_mixture_monotone_in_weight(spark, mix_docs):
    from parallel_pagerank_spark.functions.mixing import mixture_schedule

    lo = {
        tuple(r)
        for r in mixture_schedule(mix_docs, {"c": 0.25}).collect()
    }
    hi = {
        tuple(r)
        for r in mixture_schedule(mix_docs, {"c": 0.75}).collect()
    }
    assert lo <= hi


def test_mixture_deterministic_and_sql_mirror(spark, mix_docs):
    import duckdb

    from parallel_pagerank_spark.functions.mixing import (
        mixture_schedule,
        mixture_schedule_sql,
    )

    a = sorted(map(tuple, mixture_schedule(mix_docs, MIX_W).collect()))
    b = sorted(
        map(
            tuple,
            mixture_schedule(mix_docs.repartition(5), MIX_W).collect(),
        )
    )
    assert a == b
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", MIX_DOCS)
    got = sorted(map(tuple, con.sql(mixture_schedule_sql(MIX_W)).fetchall()))
    assert got == a


def test_mixture_validation(spark, mix_docs):
    from parallel_pagerank_spark.functions.mixing import mixture_schedule

    with pytest.raises(ValueError):
        mixture_schedule(mix_docs, {})
    with pytest.raises(ValueError):
        mixture_schedule(mix_docs, {"a": 0.0})


# ---------------------------------------------------------------------------
# Product quantization (functions/similarity.py pq_*) vs numpy.
# ---------------------------------------------------------------------------


def _pq_vecs():
    import numpy as np

    rng = np.random.RandomState(7)
    return [(i, rng.rand(8).round(3).tolist()) for i in range(12)]


def _py_pq(vecs, cb, m):
    # cb: {(sub, code): list}; returns {vec_id: (codes, mse)}
    out = {}
    for vid, v in vecs:
        d = len(v) // m
        codes, sumd2 = [], 0.0
        for s in range(m):
            sv = v[s * d : (s + 1) * d]
            best = None
            for (cs, code), cv in sorted(cb.items()):
                if cs != s:
                    continue
                d2 = sum((a - b) ** 2 for a, b in zip(sv, cv))
                if best is None or d2 < best[0] - 1e-15:
                    best = (d2, code)
            codes.append(best[1])
            sumd2 += best[0]
        out[vid] = (codes, sumd2 / len(v))
    return out


@pytest.fixture()
def pq_emb(spark):
    return spark.createDataFrame(
        _pq_vecs(), "vec_id long, embedding array<double>"
    )


def test_pq_seed_and_encode_vs_numpy(spark, pq_emb):
    from parallel_pagerank_spark.functions.similarity import (
        pq_encode,
        pq_seed_codebooks,
    )

    m, k = 4, 4
    cb_df = pq_seed_codebooks(pq_emb, m=m, k=k)
    cb = {(r["sub"], r["code"]): list(r["cvec"]) for r in cb_df.collect()}
    # seed = subvectors of the k smallest-id vectors, code = id rank
    vecs = dict(_pq_vecs())
    for s in range(m):
        for c in range(k):
            assert cb[(s, c)] == pytest.approx(vecs[c][s * 2 : (s + 1) * 2])
    got = {
        r["vec_id"]: (list(r["codes"]), r["mse"])
        for r in pq_encode(pq_emb, cb_df, m=m).collect()
    }
    want = _py_pq(_pq_vecs(), cb, m)
    assert set(got) == set(want)
    for vid, (codes, mse) in want.items():
        assert got[vid][0] == codes
        assert got[vid][1] == pytest.approx(mse, abs=1e-12)
    # seed members encode to their own code with zero error
    for vid in range(4):
        assert got[vid] == ([vid] * m, pytest.approx(0.0, abs=1e-15))


def test_pq_train_improves_and_stays_valid(spark, pq_emb):
    import pyspark.sql.functions as F

    from parallel_pagerank_spark.functions.similarity import (
        pq_encode,
        pq_seed_codebooks,
        pq_train,
    )

    m, k = 4, 3
    seed_mse = (
        pq_encode(pq_emb, pq_seed_codebooks(pq_emb, m=m, k=k), m=m)
        .agg(F.avg("mse"))
        .first()[0]
    )
    cb2 = pq_train(pq_emb, m=m, k=k, iters=3)
    rows = cb2.collect()
    assert len(rows) == m * k  # no cell lost (empty cells keep codewords)
    trained_mse = (
        pq_encode(pq_emb, cb2, m=m).agg(F.avg("mse")).first()[0]
    )
    assert trained_mse <= seed_mse + 1e-12


def test_pq_validation(spark, pq_emb):
    from parallel_pagerank_spark.functions.similarity import (
        pq_encode,
        pq_seed_codebooks,
        pq_train,
    )

    with pytest.raises(ValueError):
        pq_encode(pq_emb, pq_seed_codebooks(pq_emb, m=2, k=2), m=0)
    with pytest.raises(ValueError):
        pq_train(pq_emb, iters=-1)


def test_pq_adc_topk_vs_numpy(spark, pq_emb):
    from parallel_pagerank_spark.functions.similarity import (
        l2_topk_pq,
        pq_encode,
        pq_seed_codebooks,
    )

    m, k = 4, 4
    cb_df = pq_seed_codebooks(pq_emb, m=m, k=k)
    codes_df = pq_encode(pq_emb, cb_df, m=m)
    queries = pq_emb.orderBy("vec_id").limit(3)
    got = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["adc"])
        for r in l2_topk_pq(codes_df, cb_df, queries, m=m, k=5).collect()
    }

    # pure-python ADC reference
    cb = {(r["sub"], r["code"]): list(r["cvec"]) for r in cb_df.collect()}
    vecs = _pq_vecs()
    codes = _py_pq(vecs, cb, m)
    d = len(vecs[0][1]) // m
    for qid, qv in vecs[:3]:
        lut = {
            (s, c): sum(
                (a - b) ** 2
                for a, b in zip(qv[s * d : (s + 1) * d], cb[(s, c)])
            )
            for s in range(m)
            for c in range(k)
        }
        adcs = sorted(
            (sum(lut[(s, code)] for s, code in enumerate(codes[vid][0])), vid)
            for vid, _ in vecs
            if vid != qid
        )
        for rnk, (adc, vid) in enumerate(adcs[:5], start=1):
            assert got[(qid, rnk)][0] == vid
            assert got[(qid, rnk)][1] == pytest.approx(adc, abs=1e-12)


def test_pq_adc_recall_on_clustered_data(spark):
    """On well-separated clusters a trained PQ must return only
    same-cluster neighbors: intra-cluster noise (0.05) sits BELOW PQ
    resolution (same-cluster points legitimately share codes, so the
    exact-NN identity is not recoverable), but quantization error is
    far below the inter-cluster distance (~10), so every ADC top-3 hit
    must come from the query's own cluster — the property PQ actually
    guarantees."""
    import numpy as np

    from parallel_pagerank_spark.functions.similarity import (
        l2_topk_pq,
        pq_encode,
        pq_train,
    )

    rng = np.random.RandomState(11)
    centers = rng.rand(4, 8) * 10
    rows = [
        (i, (centers[i % 4] + rng.rand(8) * 0.05).round(4).tolist())
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(emb, m=4, k=8, iters=4)
    codes = pq_encode(emb, cb, m=4)
    queries = emb.orderBy("vec_id").limit(6)
    hits = l2_topk_pq(codes, cb, queries, m=4, k=3).collect()
    assert len(hits) == 6 * 3
    for r in hits:
        assert r["neighbor_id"] % 4 == r["query_id"] % 4
        # ADC distance of a same-cluster neighbor stays far below the
        # ~100+ squared distance to any other cluster's points
        assert r["adc"] < 10.0
