"""Distributed BPE training/segmentation vs a pure-Python reference
implementation of Sennrich ACL'16 §3.2 (same normalization, same EOW
sentinel, same (count desc, pair asc) tie-break)."""

import collections
import re

import pytest

TEXTS = [
    "low low low lower lowest",
    "new newer newest  low",
    "the cat sat on the mat",
    "the cats sat",
    None,
    "   ",
    "Tabs\tand\nnewlines collapse",
    "unigram",
]


def _py_norm(t):
    return re.sub(r"\s+", " ", (t or "").lower()).strip()


def _py_bpe(texts, n_merges):
    words = collections.Counter()
    for t in texts:
        n = _py_norm(t)
        if n:
            words.update(n.split(" "))
    vocab = {w: [*w, "</w>"] for w in words}
    merges = []
    for rank in range(n_merges):
        counts = collections.Counter()
        for w, f in words.items():
            s = vocab[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1]))
        for w, s in vocab.items():
            out = []
            for x in s:
                if out and out[-1] == best[0] and x == best[1]:
                    out[-1] = best[0] + best[1]
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


@pytest.fixture()
def bpe_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_pair_counts_vs_python(spark, bpe_docs):
    from parallel_pagerank_spark.functions.bpe import bpe_pair_counts

    got = {
        (r["lhs"], r["rhs"]): r["n"]
        for r in bpe_pair_counts(bpe_docs).collect()
    }
    words = collections.Counter()
    for t in TEXTS:
        n = _py_norm(t)
        if n:
            words.update(n.split(" "))
    want = collections.Counter()
    for w, f in words.items():
        s = [*w, "</w>"]
        for a, b in zip(s, s[1:]):
            want[(a, b)] += f
    assert got == dict(want)


def test_bpe_train_vs_python(spark, bpe_docs):
    from parallel_pagerank_spark.functions.bpe import bpe_train

    got = [
        (r["rank"], r["lhs"], r["rhs"])
        for r in bpe_train(bpe_docs, n_merges=12).orderBy("rank").collect()
    ]
    want, _ = _py_bpe(TEXTS, 12)
    assert got == want


def test_bpe_segment_vs_python(spark, bpe_docs):
    from parallel_pagerank_spark.functions.bpe import bpe_segment, bpe_train

    merges = bpe_train(bpe_docs, n_merges=10)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_segment(bpe_docs, merges).collect()
    }
    _, vocab = _py_bpe(TEXTS, 10)
    for i, t in enumerate(TEXTS):
        n = _py_norm(t)
        want = []
        for w in n.split(" ") if n else []:
            want.extend(vocab[w])
        assert got[i] == want, f"doc {i}"
    # reversibility: joining tokens and stripping EOW recovers the text
    for i, t in enumerate(TEXTS):
        rebuilt = "".join(got[i]).replace("</w>", " ").rstrip(" ")
        assert rebuilt == _py_norm(t)


def test_bpe_train_exhausts_and_validates(spark):
    from parallel_pagerank_spark.functions.bpe import bpe_train

    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    # 'ab' has symbols [a, b, </w>] -> only 2 merges possible
    m = bpe_train(docs, n_merges=10).orderBy("rank").collect()
    assert [(r["lhs"], r["rhs"]) for r in m] == [("a", "b"), ("ab", "</w>")]
    with pytest.raises(ValueError):
        bpe_train(docs, n_merges=-1)
