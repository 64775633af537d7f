"""Deduplication operators for large-scale training-data pipelines.

No reference counterpart; first-class engine components for the 100 TB
curation path. Design rules: everything shuffles on a bounded key (hash,
band bucket), candidate generation never goes quadratic in corpus size,
and the hot path is built-in Column expressions or Arrow-vectorized pandas
UDFs — no per-row Python.

- exact_dedup: hash-groupBy on normalized text (one shuffle).
- minhash_lsh_dedup: char-shingles → k minhashes (universal hashing
  (a·x+b) mod p over xxhash64 shingle ids) → banding → bucket join →
  exact Jaccard verification of candidates only (Broder '97 / LSH banding
  as in Mining of Massive Datasets ch.3 — public algorithms).
- simhash: 64-bit Charikar simhash via a vectorized pandas UDF (numpy
  bit tricks); near-dup = small Hamming distance within block buckets.
- ngram_jaccard_pairs: exact n-gram Jaccard for a candidate pair set.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql import types as T
from pyspark.sql.types import LongType
from pyspark.storagelevel import StorageLevel


def _persist_materialized(
    df: DataFrame, scope: list[DataFrame] | None = None
) -> DataFrame:
    """Persist + materialize an expensive intermediate that is about to be
    referenced on BOTH sides of a self-join. The eager count() matters:
    the two join-side scan stages are independent and can be scheduled
    concurrently, in which case both would miss a cold cache and recompute
    the expensive stage (the signature UDF) twice.

    Cleanup: pass a ``scope`` list and the intermediate is registered for
    explicit release via ``_release(scope)`` once the consumer has
    materialized its own result — long-lived sessions running many dedup
    jobs must not accumulate signature caches until ContextCleaner GC.
    Without a scope (direct candidate-generation use), cleanup falls back
    to ContextCleaner / LRU eviction."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    if scope is not None:
        scope.append(df)
    return df


def calibrated_nbits(n: int, floor_nbits: int, cap: int = 30) -> int:
    """SRP hash width for an n-vector corpus: wide enough that the
    expected bucket size n / 2^nbits stays <= ~2 under a uniform hash,
    never below the caller's floor, capped (srp_signatures requires
    nbits <= 32). Keeps the LSH bucket self-join linear in n instead of
    quadratic in bucket size."""
    if n < 4:
        return min(floor_nbits, cap)
    return min(cap, max(floor_nbits, math.ceil(math.log2(n / 2.0))))


def _release(scope: list[DataFrame]) -> None:
    for df in scope:
        df.unpersist()
    scope.clear()


def _materialize_and_release(
    out: DataFrame, scope: list[DataFrame]
) -> DataFrame:
    """Eagerly materialize a top-level (bounded: near-dup pairs only)
    result, then drop every intermediate cache it was built from. The
    returned DataFrame stays persisted — it is small and the caller
    consumes it next; everything upstream is released immediately."""
    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    _release(scope)
    return out

# Mersenne prime 2^31 - 1: universal-hash modulus; all arithmetic stays
# < 2^62 so ANSI mode never overflows
_MERSENNE = (1 << 31) - 1


def _normalized(text_col) -> "F.Column":
    """Delegates to the single engine-wide normalization (functions/
    text.normalized_text) so fingerprints, shingles, and language-ID can
    never silently disagree on the same text."""
    from .text import normalized_text

    return normalized_text(text_col)


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups over whitespace-normalized lowercased text:
    ``(keep_id, dup_count)`` per distinct content, keep = min id.
    One hash-shuffle on the 64-bit content fingerprint, never on the full
    text (at 100 TB the shuffle key must be fixed-width)."""
    fp = F.xxhash64(_normalized(F.col(text_col)))
    return (
        docs.select(F.col(id_col), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def exact_dedup_mapping(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonicalization companion to exact_dedup: every document mapped to
    the id that survives dedup — ``(doc_id, keep_id)`` with keep_id =
    min id over the exact-content group (keep_id == doc_id for uniques
    and group representatives).

    Same scale shape as exact_dedup: ONE hash-shuffle on the 64-bit
    content fingerprint (a window min over the fingerprint partition),
    never on the full text."""
    from pyspark.sql import Window

    fp = F.xxhash64(_normalized(F.col(text_col)))
    w = Window.partitionBy("fingerprint")
    return (
        docs.select(F.col(id_col), fp.alias("fingerprint"))
        .select(
            F.col(id_col),
            F.min(id_col).over(w).alias("keep_id"),
        )
    )


def char_shingles(text_col, n: int = 5) -> "F.Column":
    """Distinct character n-gram shingles as an array<string>; generated
    JVM-side (sequence + transform), no Python."""
    t = _normalized(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.length(t) - F.lit(n - 1), F.lit(1)),
            ),
            lambda i: F.substring(t, i, n),
        )
    )


def _minhash_params(num_hashes: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signature(
    shingles_col, num_hashes: int = 64, seed: int = 42
) -> "F.Column":
    """k-minhash signature as array<long>: h_i(x) = (a_i·x + b_i) mod p with
    x = xxhash64(shingle) folded into [0, 2^31), p = 2^31-1.

    Single-pass: ONE aggregate over the shingle array carries the running
    k-vector of minima (element-wise zip_with(least)). The naive form — k
    separate array_min(transform(...)) expressions — re-evaluates the
    shingle hashing k times per row (no CSE across the big expression
    forest) and was ~100× slower in practice."""
    a, b = _minhash_params(num_hashes, seed)
    ab = F.array(
        *[
            F.struct(
                F.lit(int(ai)).alias("a"), F.lit(int(bi)).alias("b")
            )
            for ai, bi in zip(a, b)
        ]
    )
    # hash every shingle exactly once (bound lambda variable x is evaluated
    # once per shingle, NOT once per hash function)
    xs = F.transform(
        shingles_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE))
    )
    init = F.array_repeat(F.lit(_MERSENNE + 1), num_hashes)
    return F.aggregate(
        xs,
        init,
        lambda acc, x: F.zip_with(
            acc,
            F.transform(
                ab, lambda t: F.pmod(x * t["a"] + t["b"], F.lit(_MERSENNE))
            ),
            lambda m, h: F.least(m, h),
        ),
    )


def _minhash_pandas_udf(num_hashes: int, seed: int, shingle_n: int):
    """Arrow-batched numpy MinHash: shingle set per doc (python string
    slicing — O(chars), inside the vectorized batch), ONE
    ``pd.util.hash_array`` over all shingles of the batch, then the k
    affine hashes + per-doc minima via ``np.minimum.reduceat``. Same
    (a·x+b) mod p family as the expression path but over pandas' 64-bit
    string hash instead of xxhash64 — equally valid MinHash, ~10× faster
    on long documents."""
    a, b = _minhash_params(num_hashes, seed)
    a = a[None, :]
    b = b[None, :]

    @pandas_udf(T.ArrayType(T.LongType()))
    def mh(texts: pd.Series) -> pd.Series:
        import re

        ws = re.compile(r"\s+")
        sh_lists = []
        for t in texts.fillna("").astype(str):
            t = ws.sub(" ", t.strip()).lower()
            L = max(1, len(t) - shingle_n + 1)
            sh_lists.append(list({t[i : i + shingle_n] for i in range(L)}))
        counts = np.array([len(l) for l in sh_lists], dtype=np.int64)
        flat = [x for lst in sh_lists for x in lst]
        xs = (
            pd.util.hash_array(np.asarray(flat, dtype=object)).view(
                np.int64
            )
            % _MERSENNE
        )
        offsets = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        sigs = np.empty((len(counts), a.shape[1]), dtype=np.int64)
        # chunk docs so the (shingles × k) intermediate stays ~256 MB
        chunk = max(1, 400_000 // max(1, int(counts.max() or 1)))
        for lo in range(0, len(counts), chunk):
            hi = min(len(counts), lo + chunk)
            s0 = offsets[lo]
            s1 = offsets[hi] if hi < len(counts) else len(xs)
            vals = (xs[s0:s1, None] * a + b) % _MERSENNE
            sigs[lo:hi] = np.minimum.reduceat(vals, offsets[lo:hi] - s0)
        return pd.Series(list(sigs))

    return mh


def _minhash_oph_pandas_udf(num_hashes: int, seed: int, shingle_n: int):
    """One-permutation MinHash (Li, Owen, Zhang — NIPS'12) with rotation
    densification (Shrivastava & Li — ICML'14): ONE 64-bit hash per
    shingle, ``num_hashes`` bins over the hash space, per-(doc, bin)
    minimum. Total work is O(shingles) instead of the classic path's
    O(shingles * num_hashes) — the difference between ~4k and >100k
    docs/sec/host at the 10^6-doc tier.

    Shingles are ``shingle_n``-BYTE windows of the utf-8 normalized text
    (lowercased, whitespace-collapsed) packed into uint64 and mixed with a
    splitmix64-style finalizer (public constants, Steele et al.) — fully
    numpy, no per-shingle Python objects. Duplicate shingles need no
    dedup: the min of a multiset equals the min of its set. Exact-copy
    docs produce IDENTICAL signatures at any width, so LSH-banding recall
    for exact duplicates is 1.0; empty bins (short docs) are densified by
    borrowing from the next populated bin with an offset-mixed value, so
    unrelated short docs do not collide on empty-vs-empty bands."""
    rng = np.random.default_rng(seed)
    seed_add = np.uint64(rng.integers(0, 2**63))
    k = num_hashes
    EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)
    C1 = np.uint64(0xBF58476D1CE4E5B9)
    C2 = np.uint64(0x94D049BB133111EB)
    OFFC = np.uint64(0x9E3779B97F4A7C15)

    @pandas_udf(T.ArrayType(T.LongType()))
    def mh(texts: pd.Series) -> pd.Series:
        import re

        n_docs = len(texts)
        if n_docs == 0:
            return pd.Series([], dtype=object)
        ws = re.compile(r"\s+")
        bufs = []
        for t in texts.fillna("").astype(str):
            b = ws.sub(" ", t.strip()).lower().encode("utf-8", "replace")
            if len(b) < shingle_n:
                b = b.ljust(shingle_n, b"\0")
            bufs.append(b)
        lens = np.array([len(b) for b in bufs], dtype=np.int64)
        counts = lens - (shingle_n - 1)
        buf = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        # pack every width-n byte window of the concatenated buffer into
        # uint64, then select only in-document windows by position. For
        # n <= 8 this is ONE unaligned little-endian uint64 load per
        # window (byte-stride-1 ndarray view), byteswapped and shifted —
        # bit-identical to the big-endian Horner pack (asserted in
        # tests) and ~25x faster (measured r4); wider shingles keep the
        # Horner loop.
        total_w = len(buf) - shingle_n + 1
        if shingle_n <= 8:
            pad = np.concatenate([buf, np.zeros(8, dtype=np.uint8)])
            view = np.ndarray(
                buffer=pad.data,
                dtype="<u8",
                shape=(total_w,),
                strides=(1,),
            )
            packed = view.byteswap() >> np.uint64(8 * (8 - shingle_n))
        else:
            packed = np.zeros(total_w, dtype=np.uint64)
            for j in range(shingle_n):
                packed = packed * np.uint64(256) + buf[
                    j : j + total_w
                ].astype(np.uint64)
        starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        cum = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=cum[1:])
        total_sh = int(counts.sum())
        pos = (
            np.repeat(starts, counts)
            + np.arange(total_sh)
            - np.repeat(cum, counts)
        )
        x = packed[pos] + seed_add
        # splitmix64 finalizer (uint64 wraparound is the intended mod 2^64)
        x = (x ^ (x >> np.uint64(30))) * C1
        x = (x ^ (x >> np.uint64(27))) * C2
        x ^= x >> np.uint64(31)
        bins = (x % np.uint64(k)).astype(np.int64)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        sig = np.full(n_docs * k, EMPTY, dtype=np.uint64)
        np.minimum.at(sig, doc_idx * k + bins, x)
        sig = sig.reshape(n_docs, k)
        # rotation densification: empty bin j takes value(next populated
        # bin at distance d, circular) + d*OFFC — deterministic in the
        # shingle set, distance-mixed so borrow chains don't alias
        empty = sig == EMPTY
        if empty.any():
            col = np.arange(k, dtype=np.int64)[None, :]
            t = np.where(~empty, col, 2 * k)
            nxt = np.minimum.accumulate(t[:, ::-1], axis=1)[:, ::-1]
            first = nxt[:, :1]  # first populated bin (>=1 always exists)
            nxt = np.where(nxt == 2 * k, first + k, nxt)
            d = (nxt - col).astype(np.uint64)
            rows = np.arange(n_docs, dtype=np.int64)[:, None]
            donated = sig[rows, nxt % k] + d * OFFC
            sig = np.where(empty, donated, sig)
        return pd.Series(list(sig.view(np.int64)))

    return mh


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    impl: str = "oph",
    _scope: list[DataFrame] | None = None,
) -> DataFrame:
    """Candidate near-dup pairs ``(id_a < id_b, est_jaccard)`` via LSH
    banding: a pair collides if any band of rows hashes equal. est_jaccard
    is the signature-agreement fraction (unbiased Jaccard estimate).

    impl="oph" (default, scale path): one-permutation MinHash — one hash
    per shingle, O(shingles) per doc. impl="pandas": classic k-affine-hash
    MinHash (O(shingles*k), kept as the estimator-variance baseline).
    impl="expr": pure Column-expression path (no Python workers at all)."""
    rows_per_band = num_hashes // bands
    assert bands * rows_per_band == num_hashes
    if impl == "oph":
        udf = _minhash_oph_pandas_udf(num_hashes, seed, shingle_n)
        sig = docs.select(
            F.col(id_col).alias("id"), udf(F.col(text_col)).alias("sig")
        )
    elif impl == "pandas":
        udf = _minhash_pandas_udf(num_hashes, seed, shingle_n)
        sig = docs.select(
            F.col(id_col).alias("id"), udf(F.col(text_col)).alias("sig")
        )
    else:
        sig = docs.select(
            F.col(id_col).alias("id"),
            minhash_signature(
                char_shingles(F.col(text_col), shingle_n),
                num_hashes,
                seed,
            ).alias("sig"),
        )
    # the signature UDF is the single most expensive stage of the whole
    # near-dup pipeline — cache it so the bucket self-join below reads the
    # signatures instead of recomputing them for each side
    sig = _persist_materialized(sig, _scope)
    # band entries are NARROW (band, bucket, id): carrying the 64-long
    # signature array through the self-join shuffle was the pipeline's
    # real bottleneck at the 10^6-doc tier (measured r4: 48.5 s for the
    # wide join vs 7.6 s for the signatures themselves — ~20 GB of sig
    # arrays shuffled twice). Signatures are re-attached AFTER the
    # candidate set is known, by two equi-joins against the persisted
    # 1-row-per-doc sig table — candidate pairs are orders of magnitude
    # fewer than band entries, so the wide data never enters a shuffle.
    band_entries = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.slice(
                                "sig", bi * rows_per_band + 1, rows_per_band
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    left = band_entries.select(
        "band", "bucket", F.col("id").alias("id_a")
    )
    right = band_entries.select(
        "band", "bucket", F.col("id").alias("id_b")
    )
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sig_a = sig.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a")
    )
    sig_b = sig.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b")
    )
    pairs = cand.join(sig_a, "id_a").join(sig_b, "id_b")
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda t: t,
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        (agree / F.lit(float(len(range(num_hashes))))).alias(
            "est_jaccard"
        ),
    )


def minhash_lsh_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    **lsh_kw,
) -> DataFrame:
    """Near-dup pairs with exact shingle-Jaccard verification of LSH
    candidates only: ``(id_a, id_b, jaccard)`` with jaccard >= threshold.
    Eager: the (bounded) pair result is materialized and every signature/
    shingle cache released before returning."""
    scope: list[DataFrame] = []
    cands = minhash_lsh_candidates(
        docs, id_col, text_col, _scope=scope, **lsh_kw
    )
    shingle_n = lsh_kw.get("shingle_n", 5)
    # shingles feed both sides of the verification join — derive them once
    sh = _persist_materialized(
        docs.select(
            F.col(id_col).alias("id"),
            char_shingles(F.col(text_col), shingle_n).alias("sh"),
        ),
        scope,
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = cands.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    out = (
        joined.select(
            "id_a", "id_b", (inter / union).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return _materialize_and_release(out, scope)


@pandas_udf(LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit Charikar simhash, Arrow-vectorized end to end: ALL tokens of
    the batch are hashed in one ``pd.util.hash_array`` call (deterministic
    64-bit), bit votes are summed per document with ``np.add.reduceat`` —
    no per-row or per-token Python loops."""
    token_lists = texts.fillna("").astype(str).str.lower().str.split()
    counts = token_lists.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = [t for lst in token_lists for t in (lst or [])]
    out = np.zeros(len(texts), dtype=np.int64)
    if flat:
        hs = pd.util.hash_array(np.asarray(flat, dtype=object))  # uint64
        # per-token ±1 votes for each of the 64 bits
        bits = (
            (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).astype(np.int8)
        votes = 2 * bits.astype(np.int32) - 1
        # segment-sum votes per document
        offsets = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        nonempty = counts > 0
        seg = np.add.reduceat(votes, offsets[nonempty], axis=0)
        fp_bits = (seg > 0).astype(np.uint64)
        fps = (fp_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[nonempty] = fps.view(np.int64)
    return pd.Series(out)


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """``(id, simhash: long)`` per document."""
    return docs.select(
        F.col(id_col).alias("id"), _simhash64(F.col(text_col)).alias("simhash")
    )


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into ``blocks``
    16-bit blocks; any pair within distance max_hamming < blocks agrees on
    at least one block → join per block bucket, verify distance exactly
    (Manku et al. WWW'07 pattern). Never all-pairs. Eager: the (bounded)
    pair result is materialized and the fingerprint cache released before
    returning."""
    assert max_hamming < blocks
    scope: list[DataFrame] = []
    # cache fingerprints: the block-bucket self-join references them twice
    sh = _persist_materialized(simhash(docs, id_col, text_col), scope)
    width = 64 // blocks
    entries = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("block"),
                        F.shiftrightunsigned(
                            F.col("simhash"), bi * width
                        ).bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
                    )
                    for bi in range(blocks)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.block", "bk.key")
    left = entries.select(
        "block", "key", F.col("id").alias("id_a"), F.col("simhash").alias("h_a")
    )
    right = entries.select(
        "block", "key", F.col("id").alias("id_b"), F.col("simhash").alias("h_b")
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    out = (
        left.join(right, ["block", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return _materialize_and_release(out, scope)


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.9,
    method: str = "lsh",
    dim: int | None = None,
    nbits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ``(id_a < id_b, cosine)`` with
    cosine >= threshold.

    method="lsh" (scale path): SRP bucket candidates (signatures persisted
    before the self-join) → exact cosine verification of candidates only;
    a pair of IDENTICAL vectors collides in every table, so recall is 1.0
    for exact copies and grows with n_tables for near-copies.
    method="bruteforce": exact all-pairs — the documented small-N baseline
    and the oracle-checkable form.

    ``nbits`` is a FLOOR: the effective hash width is auto-calibrated to
    ``max(nbits, ceil(log2(n/2)))`` so the expected bucket size stays O(1)
    (MMDS ch.3). Without this, the bucket self-join is quadratic in bucket
    size — at n=10^6 the 12-bit default would mean ~244 rows per bucket,
    ~5·10^8 candidate pairs, and a spill-to-disk blowup. Calibration never
    costs exact-copy recall (identical vectors collide at any width);
    near-copy recall per table falls as width grows, so raise ``n_tables``
    along with corpus size if near-copy recall matters.

    Note on output size: the pair result is inherently quadratic in the
    size of any identical-vector group (g copies → g·(g-1)/2 pairs). For
    corpora with large duplicate groups, consume the cluster-level API
    (``near_dup_clusters``) instead of the raw pair set.

    Eager: the (bounded) pair result is materialized and the norm/
    signature caches released before returning."""
    from .similarity import _dot, _norm, srp_signatures

    scope: list[DataFrame] = []
    # norms feed both sides of the verification join — compute once
    base = _persist_materialized(
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("nrm"),
        ),
        scope,
    )
    if method == "bruteforce":
        a = base.select(
            F.col("id").alias("id_a"),
            F.col("vec").alias("vec_a"),
            F.col("nrm").alias("nrm_a"),
        )
        b = base.select(
            F.col("id").alias("id_b"),
            F.col("vec").alias("vec_b"),
            F.col("nrm").alias("nrm_b"),
        )
        joined = a.join(b, F.col("id_b") > F.col("id_a"))
    elif method == "lsh":
        if dim is None:
            row = emb.select(F.size(vec_col).alias("d")).first()
            if row is None:  # empty input: no pairs
                _release(scope)
                return emb.sparkSession.createDataFrame(
                    [], "id_a long, id_b long, cosine double"
                )
            dim = row["d"]
        # base is persisted+materialized above, so this count is a cached
        # scan, not a recompute of the norm stage.
        nbits = calibrated_nbits(base.count(), nbits)
        sig = _persist_materialized(
            srp_signatures(
                emb, dim, nbits, n_tables, id_col, vec_col, seed
            ),
            scope,
        )
        cand = (
            sig.select(F.col("id").alias("id_a"), "bucket")
            .join(sig.select(F.col("id").alias("id_b"), "bucket"), "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        a = base.select(
            F.col("id").alias("id_a"),
            F.col("vec").alias("vec_a"),
            F.col("nrm").alias("nrm_a"),
        )
        b = base.select(
            F.col("id").alias("id_b"),
            F.col("vec").alias("vec_b"),
            F.col("nrm").alias("nrm_b"),
        )
        joined = cand.join(a, "id_a").join(b, "id_b")
    else:
        raise ValueError(f"unknown method: {method}")
    cosine = _dot(F.col("vec_a"), F.col("vec_b")) / F.greatest(
        F.col("nrm_a") * F.col("nrm_b"), F.lit(1e-12)
    )
    out = (
        joined.select("id_a", "id_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    return _materialize_and_release(out, scope)


def jaccard_similarity_join(
    docs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """EXACT all-pairs set-similarity join: every document pair whose
    char-n-gram-shingle Jaccard >= ``threshold`` → ``(id_a, id_b,
    jaccard)`` with id_a < id_b. Unlike MinHash-LSH this has NO false
    negatives — the candidate stage is a lossless prefix filter, the
    verify stage computes true Jaccard.

    Scale design — prefix filtering (Chaudhuri et al., ICDE 2006;
    Bayardo et al., WWW 2007 "Scaling up all pairs similarity search";
    MapReduce formulation Vernica et al., SIGMOD 2010): a naive inverted
    index joins every pair sharing ANY shingle, and a stop-shingle
    appearing in d documents alone yields d² candidates (in this
    engine's testdata one shingle hits 80% of docs). Instead, order the
    shingle universe by ascending document frequency and index only each
    set's PREFIX — its (|A| - ceil(t·|A|) + 1) globally-rarest shingles.
    Two sets with J >= t overlap in > |A| - t·|A| positions, so they
    MUST share a prefix shingle (lossless); candidates now meet only on
    globally RARE keys, so the self-join fan-out is bounded by rare-key
    df, not hot-key df. Verify joins the two full shingle arrays back by
    id (array_intersect/array_union JVM-side) — per-pair work, no
    re-shuffle of the inverted index.

    The driver oracle (``ngram_jaccard``) is the plain inverted-index
    SQL — a DIFFERENT plan computing the same exact result, which is the
    point: the scale path's prefix pruning is checked hash-exactly
    against the unpruned definition."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t_lit = float(threshold)
    sh = docs.select(
        F.col(id_col).alias("id"),
        char_shingles(F.col(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    scope: list[DataFrame] = []
    sh = _persist_materialized(sh, scope)
    flat = sh.select("id", F.explode("sh").alias("g"))
    # global shingle document frequency; (df, g) is the total order that
    # "rarest first" ranks by — ties broken by the shingle text so both
    # engines (and reruns) agree deterministically
    df_tbl = flat.groupBy("g").agg(F.count("*").alias("df"))
    ranked = flat.join(df_tbl, "g").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("id").orderBy("df", "g")
        ),
    )
    sizes = sh.select("id", F.size("sh").alias("sz"))
    prefix = (
        ranked.join(sizes, "id")
        .filter(
            F.col("rnk")
            <= F.col("sz") - F.ceil(F.lit(t_lit) * F.col("sz")) + F.lit(1)
        )
        .select("id", "g")
    )
    prefix = _persist_materialized(prefix, scope)
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    verified = (
        cand.join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t_lit)
    )
    return _materialize_and_release(verified, scope)


def near_dup_clusters(
    docs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Near-duplicate CLUSTERS: the transitive closure of the exact
    Jaccard similarity graph — ``(doc_id, cluster_id)`` for every
    document in at least one >= threshold pair, cluster_id = min doc_id
    of its component. This is the standard dedup composition (pairs →
    connected components → keep one per cluster) used by large-scale
    corpus pipelines; pairs alone under-merge when A~B and B~C but A≁C.

    The component step runs on the PAIR graph only (vertices = documents
    appearing in some pair — explicitly passed, so the dense 0..max_id
    vertex rule never materializes the whole corpus id range)."""
    from ..operators.components import connected_components

    pairs = jaccard_similarity_join(docs, threshold, id_col, text_col, n)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    res = connected_components(edges, vertices=verts)
    out = res.components.select(
        F.col("id").alias(id_col), F.col("component").alias("cluster_id")
    )
    pairs.unpersist()
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact word n-gram Jaccard for a given candidate pair set
    ``pairs(id_a, id_b)`` → ``(id_a, id_b, jaccard)``."""
    t = _normalized(F.col(text_col))
    toks = F.split(t, " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)),
            ),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    g = docs.select(F.col(id_col).alias("id"), grams.alias("g"))
    a = g.select(F.col("id").alias("id_a"), F.col("g").alias("g_a"))
    b = g.select(F.col("id").alias("id_b"), F.col("g").alias("g_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("g_a", "g_b")).cast("double")
    union = F.size(F.array_union("g_a", "g_b")).cast("double")
    return joined.select("id_a", "id_b", (inter / union).alias("jaccard"))


def cross_jaccard_join(
    new_docs: DataFrame,
    reference: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """EXACT cross-corpus set-similarity join (the R×S case of Vernica
    et al., SIGMOD 2010 §4): every (new, reference) pair whose
    char-n-gram-shingle Jaccard >= ``threshold`` → ``(new_id, ref_id,
    jaccard)``. No false negatives — same lossless prefix filter as
    :func:`jaccard_similarity_join`, with ONE shared shingle ordering:
    document frequency is computed over the UNION of both corpora (the
    prefix-filter guarantee needs both sides ranked by the same total
    order), each side indexes only its (|A| − ceil(t·|A|) + 1)
    globally-rarest shingles, and candidates meet new-prefix ×
    ref-prefix on those rare keys only. Verify re-joins the full
    shingle arrays by id — per-pair JVM work, hot-shingle-skew-proof
    like the self-join variant."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t_lit = float(threshold)
    scope: list[DataFrame] = []

    def _shingled(docs: DataFrame, side: str) -> DataFrame:
        return docs.select(
            F.lit(side).alias("side"),
            F.col(id_col).alias("id"),
            char_shingles(F.col(text_col), n).alias("sh"),
        ).filter(F.size("sh") > 0)

    sh = _persist_materialized(
        _shingled(new_docs, "n").unionByName(_shingled(reference, "r")),
        scope,
    )
    flat = sh.select("side", "id", F.explode("sh").alias("g"))
    df_tbl = flat.groupBy("g").agg(F.count("*").alias("df"))
    ranked = flat.join(df_tbl, "g").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("side", "id").orderBy("df", "g")
        ),
    )
    sizes = sh.select("side", "id", F.size("sh").alias("sz"))
    prefix = (
        ranked.join(sizes, ["side", "id"])
        .filter(
            F.col("rnk")
            <= F.col("sz") - F.ceil(F.lit(t_lit) * F.col("sz")) + F.lit(1)
        )
        .select("side", "id", "g")
    )
    prefix = _persist_materialized(prefix, scope)
    cand = (
        prefix.filter(F.col("side") == "n")
        .select(F.col("id").alias("new_id"), "g")
        .join(
            prefix.filter(F.col("side") == "r").select(
                F.col("id").alias("ref_id"), "g"
            ),
            "g",
        )
        .select("new_id", "ref_id")
        .distinct()
    )
    full = sh.select("side", "id", "sh")
    verified = (
        cand.join(
            full.filter(F.col("side") == "n").select(
                F.col("id").alias("new_id"), F.col("sh").alias("sh_n")
            ),
            "new_id",
        )
        .join(
            full.filter(F.col("side") == "r").select(
                F.col("id").alias("ref_id"), F.col("sh").alias("sh_r")
            ),
            "ref_id",
        )
        .select(
            "new_id",
            "ref_id",
            (
                F.size(F.array_intersect("sh_n", "sh_r")).cast("double")
                / F.size(F.array_union("sh_n", "sh_r")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t_lit)
    )
    return _materialize_and_release(verified, scope)


def dedup_against(
    new_docs: DataFrame,
    reference: DataFrame,
    threshold: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Incremental (cross-snapshot) dedup — the shape every periodic
    crawl refresh needs: dedup the NEW batch against the already-kept
    REFERENCE corpus without ever re-shuffling the reference's text.

    Exact tier (always): a new doc is dropped if its normalized-content
    fingerprint already exists in the reference (left_anti on the
    64-bit key — fixed-width shuffle, reference side reduced to
    distinct fingerprints), then the survivors are exact-deduped among
    themselves (keep = min id). With ``threshold`` set, a near tier
    additionally drops survivors whose char-shingle Jaccard against ANY
    reference doc >= threshold (:func:`cross_jaccard_join` — exact, no
    false negatives). Returns ``(keep_id, dup_count)`` per surviving
    content group, same contract as :func:`exact_dedup`."""
    fp_new = new_docs.select(
        F.col(id_col),
        F.xxhash64(_normalized(F.col(text_col))).alias("fingerprint"),
    )
    fp_ref = reference.select(
        F.xxhash64(_normalized(F.col(text_col))).alias("fingerprint")
    ).distinct()
    fresh = fp_new.join(fp_ref, "fingerprint", "left_anti")
    if threshold is not None:
        near = cross_jaccard_join(
            new_docs, reference, threshold, id_col, text_col, n
        ).select(F.col("new_id").alias(id_col)).distinct()
        fresh = fresh.join(near, id_col, "left_anti")
    return fresh.groupBy("fingerprint").agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("dup_count"),
    )
