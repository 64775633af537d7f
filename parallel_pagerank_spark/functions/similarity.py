"""Similarity search over embedding columns (array<float>).

No reference counterpart; first-class training-data-pipeline components.

- brute-force cosine top-k: exact baseline. The dot product is a pure
  Column expression (zip_with + aggregate → JVM, whole-stage codegen);
  top-k per query via window rank over the scored join.
- SRP-LSH bucketed ANN: signed-random-projection signatures (Charikar '02)
  computed by an Arrow-vectorized pandas UDF (one numpy matmul per batch),
  bucket join on signature prefix — the scale path: candidate set per query
  is a bucket, not the corpus.
- IVF (inverted-file) ANN: k-means-lite coarse quantizer (seeded, few
  iterations, driver-side centroids broadcast as literals), probe the
  nearest ``nprobe`` cells only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql import types as T
from pyspark.sql.types import IntegerType, LongType


def _norm(col) -> "F.Column":
    return F.sqrt(
        F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def _dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: ``(query_id, neighbor_id, cosine, rnk)``.

    queries is expected to be small → broadcast; the corpus is streamed
    through one whole-stage-codegen projection, then a per-query window
    keeps the top k. Self-matches (same id) are excluded. Deterministic
    tie-break: (cosine desc, neighbor_id asc)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("cvec"), F.col("qvec"))
                / F.greatest(
                    F.col("cnorm") * F.col("qnorm"), F.lit(1e-12)
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def _srp_udf(planes: np.ndarray, nbits: int):
    """Multi-table SRP: ``planes`` is (n_tables*nbits, dim); one matmul per
    Arrow batch computes every table's signature at once."""
    flat = planes.astype(np.float64)
    n_tables = flat.shape[0] // nbits

    @pandas_udf(T.ArrayType(T.LongType()))
    def srp(vecs: pd.Series) -> pd.Series:
        m = np.stack(
            [
                np.asarray(v, dtype=np.float64)
                if v is not None
                else np.zeros(flat.shape[1])
                for v in vecs
            ]
        )
        proj = m @ flat.T  # (batch, n_tables*nbits)
        bits = (proj > 0).astype(np.uint64).reshape(len(m), n_tables, nbits)
        sig = (bits << np.arange(nbits, dtype=np.uint64)[None, None, :]).sum(
            axis=2, dtype=np.uint64
        )
        # tag each signature with its table index so buckets never cross
        # tables: bucket = table * 2^nbits + sig
        sig += (
            np.arange(n_tables, dtype=np.uint64)[None, :] << np.uint64(nbits)
        )
        return pd.Series(list(sig.view(np.int64)))

    return srp


def srp_signatures(
    df: DataFrame,
    dim: int,
    nbits: int = 16,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """``(id, bucket)`` — one row per LSH table (bucket ids are
    table-disjoint); nbits ≤ 32."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables * nbits, dim))
    udf = _srp_udf(planes, nbits)
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(udf(F.col(vec_col))).alias("bucket"),
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nbits: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: candidates share the SRP bucket, then exact
    cosine + window top-k within candidates. Recall grows with smaller
    nbits (bigger buckets); the shuffle key is the bucket, so corpus-side
    work is one hash shuffle instead of a broadcast cross-product."""
    csig = srp_signatures(corpus, dim, nbits, n_tables, id_col, vec_col, seed)
    qsig = srp_signatures(queries, dim, nbits, n_tables, id_col, vec_col, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    cand = (
        csig.select(F.col("id").alias("neighbor_id"), "bucket")
        .join(
            qsig.select(F.col("id").alias("query_id"), "bucket"), "bucket"
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(c, "neighbor_id")
        .join(q, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("cvec"), F.col("qvec"))
                / F.greatest(F.col("cnorm") * F.col("qnorm"), F.lit(1e-12))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def ivf_assign(
    df: DataFrame,
    dim: int,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    kmeans_iters: int = 5,
    sample_rows: int = 2048,
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: fit tiny k-means on a driver-side sample
    (seeded, deterministic), assign every vector to its nearest centroid
    with one Arrow-vectorized matmul. Returns (assignments(id, cell),
    centroids)."""
    sample = np.stack(
        [
            np.asarray(r["v"], dtype=np.float64)
            for r in df.select(F.col(vec_col).alias("v"))
            .limit(sample_rows)
            .collect()
        ]
    )
    rng = np.random.default_rng(seed)
    cents = sample[
        rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)
    ]
    for _ in range(kmeans_iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for ci in range(len(cents)):
            pts = sample[assign == ci]
            if len(pts):
                cents[ci] = pts.mean(axis=0)

    cfixed = cents.copy()

    @pandas_udf(IntegerType())
    def nearest_cell(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = (
            (m**2).sum(axis=1)[:, None]
            - 2 * m @ cfixed.T
            + (cfixed**2).sum(axis=1)[None, :]
        )
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return (
        df.select(
            F.col(id_col).alias("id"), nearest_cell(F.col(vec_col)).alias("cell")
        ),
        cents,
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate cosine top-k ``(query_id, neighbor_id, cosine,
    rnk)``: corpus vectors are bucketed by nearest coarse centroid
    (``ivf_assign``); each query probes only its ``n_probe`` nearest
    cells, so per-query work is n_probe/n_cells of the corpus instead of
    all of it. Candidates get exact cosine + per-query window top-k —
    identical scoring/tie-break to the brute-force and LSH paths.

    Scale shape: the probe join shuffles on the cell id (bounded key
    space), never all-pairs; the only driver-side piece is the seeded
    k-means sample inside ``ivf_assign`` (bounded ``sample_rows``)."""
    assign, cents = ivf_assign(
        corpus, dim, n_cells, id_col, vec_col, seed
    )
    cfixed = cents.copy()
    probe = min(n_probe, len(cfixed))

    @pandas_udf(T.ArrayType(IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = (
            (m**2).sum(axis=1)[:, None]
            - 2 * m @ cfixed.T
            + (cfixed**2).sum(axis=1)[None, :]
        )
        near = np.argsort(d2, axis=1)[:, :probe].astype(np.int32)
        return pd.Series(list(near))

    qcells = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )
    cand = (
        assign.withColumnRenamed("id", "neighbor_id")
        .join(qcells, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    scored = (
        cand.join(c, "neighbor_id")
        .join(q, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("cvec"), F.col("qvec"))
                / F.greatest(F.col("cnorm") * F.col("qnorm"), F.lit(1e-12))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def embedding_centroids(
    emb: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group centroid of an embedding column, in LONG form:
    ``(group, pos, centroid_val, n_vectors)`` — one row per (group,
    dimension). Long form keeps the whole computation a single built-in
    groupBy (posexplode → avg, whole-stage codegen, one shuffle on
    (group, pos)); the wide array form is a trivial collect_list away
    for callers that want it, and long form is what the IVF coarse
    quantizer and per-cluster diagnostics actually consume.

    NULL vectors contribute no rows (posexplode drops them), matching
    SQL AVG's null handling."""
    return (
        emb.select(
            F.col(group_col).alias("group"),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        .groupBy("group", "pos")
        .agg(
            F.avg(F.col("val").cast("double")).alias("centroid_val"),
            F.count("*").alias("n_vectors"),
        )
    )


def scalar_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-dimension scalar quantization of an embedding column —
    ``(vec_id, codes: array<int>, mse: double)`` where codes[i] =
    floor((v[i] - min_i) / scale_i) clamped to [0, 2^bits - 1] with
    scale_i = (max_i - min_i) / (2^bits - 1), and mse is the
    reconstruction error against the dequantized vector. This is the
    SQ8 storage layout ANN systems use to cut vector memory 4x before
    an exact re-rank (e.g. the IVF_SQ8 index family in Johnson et al.
    2017 arXiv:1702.08734 §4 and its descendants).

    Scale design: the per-dimension min/max table is ONE posexplode +
    aggregation (|dims| rows — tiny), broadcast back as an array via a
    1-row cross join; quantize/dequantize/MSE are pure JVM-side
    higher-order Column functions (transform/aggregate/zip_with) — no
    Python, no second pass over the data, no shuffle of the vectors
    themselves. floor() (not round) keeps the code engine-portable:
    IEEE double (v - min) / scale is bit-identical across engines, and
    floor has no half-way ties the way round does.

    Constant dimensions (max == min) get scale 0 → code 0, dequantized
    exactly to the constant value (MSE contribution 0)."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    levels = float((1 << bits) - 1)
    dims = (
        emb.select(F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.min(F.col("val").cast("double")).alias("lo"),
            F.max(F.col("val").cast("double")).alias("hi"),
        )
    )
    bounds = dims.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "lo", "hi"))
        ).alias("b")
    ).select(
        F.transform("b", lambda s: s["lo"]).alias("los"),
        F.transform("b", lambda s: s["hi"]).alias("his"),
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    lo_at = lambda i: F.element_at("los", i + 1)  # noqa: E731
    hi_at = lambda i: F.element_at("his", i + 1)  # noqa: E731
    scale_at = lambda i: (hi_at(i) - lo_at(i)) / F.lit(levels)  # noqa: E731
    code = lambda x, i: F.when(  # noqa: E731
        scale_at(i) > 0.0,
        F.least(
            F.lit(int(levels)),
            F.floor((x - lo_at(i)) / scale_at(i)).cast("int"),
        ),
    ).otherwise(F.lit(0))
    codes = F.zip_with(
        v,
        F.sequence(F.lit(0), F.size(v) - F.lit(1)),
        lambda x, i: code(x, i),
    )
    dequant = F.zip_with(
        F.col("codes"),
        F.sequence(F.lit(0), F.size("codes") - F.lit(1)),
        lambda c, i: lo_at(i) + c.cast("double") * scale_at(i),
    )
    with_codes = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
        .filter(F.col(vec_col).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .withColumn("codes", codes)
    )
    err = F.zip_with(v, dequant, lambda a, b: (a - b) * (a - b))
    return with_codes.select(
        "vec_id",
        "codes",
        (
            F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x)
            / F.size(err).cast("double")
        ).alias("mse"),
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Nearest-centroid assignment by cosine — the E-step of distributed
    k-means (Lloyd's algorithm): with :func:`embedding_centroids` as the
    M-step, one assign→centroid round trip is a full Lloyd iteration
    executed entirely as built-in DataFrame ops.

    Returns ``(id, centroid_id)``: for every vector the centroid with
    the highest cosine similarity, ties to the smallest centroid id
    (total, engine-portable order). The centroid table is broadcast
    (k rows); the argmax is ONE hash aggregation via ``min_by`` over a
    (−cosine, id)-ordered struct — no window sort, no per-vector
    row_number. At 100 TB this is a single scan of the vectors at full
    parallelism; k-means scales in k only through the broadcast width.
    """
    c = centroids.select(
        F.col(centroid_id_col).alias("centroid_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vvec"),
        _norm(F.col(vec_col)).alias("vnorm"),
    )
    scored = v.join(F.broadcast(c)).select(
        "id",
        "centroid_id",
        (
            _dot(F.col("vvec"), F.col("cvec"))
            / F.greatest(F.col("vnorm") * F.col("cnorm"), F.lit(1e-12))
        ).alias("cos"),
    )
    return scored.groupBy("id").agg(
        F.min_by(
            "centroid_id", F.struct(-F.col("cos"), F.col("centroid_id"))
        ).alias("centroid_id")
    )


def _subvectors(
    vectors: DataFrame, m: int, id_col: str, vec_col: str
) -> DataFrame:
    """``(id, sub, subvec)``: each vector cut into ``m`` contiguous
    subvectors, array-side (``sequence`` + ``slice`` — no join, no
    python). Dimensionality must divide evenly by ``m``."""
    v = F.col(vec_col)
    subdim = (F.size(v) / F.lit(m)).cast("int")
    pieces = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.struct(
            s.alias("sub"),
            F.slice(v, s * subdim + 1, subdim).alias("subvec"),
        ),
    )
    return (
        vectors.filter(v.isNotNull())
        .filter(F.size(v) % F.lit(m) == 0)
        .select(F.col(id_col).alias("id"), F.explode(pieces).alias("p"))
        .select("id", F.col("p.sub").alias("sub"), F.col("p.subvec").alias("subvec"))
    )


def _l2sq(a, b) -> "F.Column":
    """Squared L2 distance of two arrays as a left-fold (fixed
    summation order: engine-portable up to IEEE non-associativity of
    the same sequence, i.e. bit-exact for the same fold order)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding (Jégou, Douze & Schmid, *Product
    Quantization for Nearest Neighbor Search*, TPAMI 2011 §II): each
    vector is cut into ``m`` contiguous subvectors and each subvector
    replaced by the id of its nearest (squared-L2) codeword in that
    subspace's codebook — the memory layout that makes billion-vector
    ANN fit in RAM (m bytes per vector at k=256).

    ``codebooks`` is ``(sub, code, cvec)`` (from :func:`pq_train` or
    any deterministic seeding). Returns ``(vec_id, codes: array<int>,
    mse)`` where mse is the mean squared reconstruction error (the sum
    of the chosen per-subspace distances / dimensionality).

    Scale shape: subvector derivation is array-side; the codebook
    (m·k rows) is BROADCAST; the argmin is one hash aggregation via
    ``min_by`` over a (distance, code) struct (ties to the smallest
    code — total, engine-portable order); the final per-vector
    assembly is one more hash aggregation with ``array_sort`` over
    (sub, code) structs. Two shuffles total, both keyed on the vector
    id — never on anything data-dependent, so no skew hazard.
    """
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    subs = _subvectors(vectors, m, id_col, vec_col)
    cb = codebooks.select(
        F.col("sub").alias("csub"), "code", F.col("cvec")
    )
    scored = subs.join(
        F.broadcast(cb), subs["sub"] == cb["csub"]
    ).select(
        "id",
        "sub",
        "code",
        _l2sq(F.col("subvec"), F.col("cvec")).alias("d2"),
    )
    best = scored.groupBy("id", "sub").agg(
        F.min_by("code", F.struct("d2", "code")).alias("code"),
        F.min("d2").alias("d2"),
    )
    # one sorted struct list -> codes AND an ORDERED d2 fold: summing the
    # m per-subspace distances in sub order keeps mse bit-deterministic
    # (a bare sum() would add in shuffle-arrival order)
    picked = F.array_sort(F.collect_list(F.struct("sub", "code", "d2")))
    return (
        best.groupBy("id")
        .agg(
            F.transform(picked, lambda s: s["code"]).alias("codes"),
            F.aggregate(
                picked, F.lit(0.0), lambda acc, s: acc + s["d2"]
            ).alias("sumd2"),
        )
        .join(
            vectors.select(
                F.col(id_col).alias("id"),
                F.size(F.col(vec_col)).cast("double").alias("dim"),
            ),
            "id",
        )
        .select(
            F.col("id").alias("vec_id"),
            "codes",
            (F.col("sumd2") / F.col("dim")).alias("mse"),
        )
    )


def pq_seed_codebooks(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic codebook seeding: subspace ``s``'s codewords are
    the ``s``-th subvectors of the ``k`` smallest-id vectors (code =
    rank in that order) — the same first-k convention as the
    cluster_assign driver query; feed to :func:`pq_train` to refine."""
    subs = _subvectors(
        vectors.orderBy(id_col).limit(k), m, id_col, vec_col
    )
    w = Window.partitionBy("sub").orderBy("id")
    return subs.select(
        "sub",
        (F.row_number().over(w) - 1).alias("code"),
        F.col("subvec").alias("cvec"),
    )


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train PQ codebooks by per-subspace Lloyd iterations — all ``m``
    subspaces advance in ONE distributed E-step + ONE M-step per round
    (rows keyed (sub, code); the codebook stays m·k rows and is
    re-broadcast each round). Deterministic: seeded by
    :func:`pq_seed_codebooks`, argmin ties to the smallest code. Empty
    cells keep their previous codeword (standard k-means practice)."""
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    cb = pq_seed_codebooks(vectors, m=m, k=k, id_col=id_col, vec_col=vec_col)
    subs = _subvectors(vectors, m, id_col, vec_col).persist()
    try:
        for _ in range(iters):
            scored = subs.join(
                F.broadcast(cb.select(F.col("sub").alias("csub"), "code", "cvec")),
                subs["sub"] == F.col("csub"),
            ).select(
                "id", "sub", "code",
                _l2sq(F.col("subvec"), F.col("cvec")).alias("d2"),
                "subvec",
            )
            assigned = scored.groupBy("id", "sub").agg(
                F.min_by(
                    F.struct("code", "subvec"), F.struct("d2", "code")
                ).alias("a")
            )
            means = (
                assigned.select(
                    "sub",
                    F.col("a.code").alias("code"),
                    F.posexplode(F.col("a.subvec")).alias("pos", "val"),
                )
                .groupBy("sub", "code", "pos")
                .agg(F.avg(F.col("val").cast("double")).alias("cv"))
                .groupBy("sub", "code")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                        lambda s: s["cv"],
                    ).alias("newvec")
                )
            )
            cb = (
                cb.join(means, ["sub", "code"], "left")
                .select(
                    "sub",
                    "code",
                    F.coalesce(F.col("newvec"), F.col("cvec")).alias("cvec"),
                )
                .localCheckpoint()
            )
    finally:
        subs.unpersist()
    return cb


def l2_topk_pq(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    m: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (Jégou, Douze & Schmid,
    TPAMI 2011 §III ADC): per query, a lookup table ``LUT[sub][code] =
    ||q_sub − c_{sub,code}||²`` is built against the exact query
    subvectors, and a coded corpus vector's approximate squared-L2
    distance is the m-term fold ``Σ_sub LUT[sub][codes[sub]]`` — m
    array lookups + adds per (query, vector) instead of a full
    dim-width scan of the raw corpus.

    ``codes`` is (vec_id, codes) from :func:`pq_encode`; ``queries``
    holds raw vectors and is expected small. Returns ``(query_id,
    neighbor_id, adc, rnk)``, top ``k`` per query by (adc asc,
    neighbor_id asc), self-matches excluded.

    Scale shape: the LUTs are (|queries| · m · n_codes) rows folded to
    ONE nested-array row per query and BROADCAST; the corpus side is a
    single scan of the (vec_id, codes) table — the raw embeddings are
    never touched, which is the entire point of PQ at 10⁹ vectors —
    with the ADC fold array-side (``zip_with`` + ``aggregate``,
    whole-stage codegen). The only shuffle is the per-query top-k
    window, and |queries| bounds its width.
    """
    qsubs = _subvectors(queries, m, id_col, vec_col)
    cb = codebooks.select(F.col("sub").alias("csub"), "code", "cvec")
    lut_rows = qsubs.join(F.broadcast(cb), qsubs["sub"] == cb["csub"]).select(
        F.col("id").alias("query_id"),
        "sub",
        "code",
        _l2sq(F.col("subvec"), F.col("cvec")).alias("d2"),
    )
    per_sub = lut_rows.groupBy("query_id", "sub").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("code", "d2"))),
            lambda s: s["d2"],
        ).alias("row")
    )
    luts = per_sub.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "row"))),
            lambda s: s["row"],
        ).alias("lut")
    )
    scored = (
        codes.select(F.col("vec_id").alias("neighbor_id"), "codes")
        .join(F.broadcast(luts), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("lut"),
                    lambda c, row: F.element_at(row, c.cast("int") + 1),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def semantic_dup_pairs(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Within-cluster semantic near-duplicate pairs — the pair-mining
    half of SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication",
    arXiv:2303.09540): embeddings are first assigned to their nearest
    centroid (:func:`assign_to_centroids`), then cosine similarity is
    computed ONLY between vectors sharing a centroid; pairs with
    cosine >= threshold are semantic duplicates.

    Returns ``(id_a, id_b, cosine)`` with ``id_a < id_b``.

    Scale shape: this is the whole point of SemDeDup — the quadratic
    pair work is confined to clusters of expected size n/k, so total
    work is O(n^2/k) instead of O(n^2), and the self-join shuffles on
    the centroid id. Choose k proportional to n (the paper uses
    ~n/10^4..10^5 per cluster at web scale) to bound cluster size; a
    pathologically hot cluster is the same hot-key problem as any
    skewed join (cap it with a per-cluster size quota or re-cluster
    its members against sub-centroids).
    """
    assign = assign_to_centroids(
        vectors, centroids, id_col=id_col, vec_col=vec_col,
        centroid_id_col=centroid_id_col,
    )
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
    ).join(assign, "id")
    a = v.select(
        F.col("id").alias("id_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), "centroid_id",
    )
    b = v.select(
        F.col("id").alias("id_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), "centroid_id",
    )
    return (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                _dot(F.col("va"), F.col("vb"))
                / F.greatest(F.col("na") * F.col("nb"), F.lit(1e-12))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """SemDeDup keep-set: drop a vector iff SOME SMALLER-id vector in
    its cluster is cosine-similar at >= threshold; keep the rest.

    Returns ``(id, centroid_id)`` of the kept vectors.

    The drop rule is the id-priority DOMINANCE rule — deterministic,
    one anti-join, and exactly expressible in SQL (the driver oracle
    replays it) — not the sequential greedy chain of the original
    implementation (greedy re-checks against *kept* docs only, so it
    can retain a doc whose only close neighbor was itself dropped).
    Dominance drops a superset of greedy's drops: every greedy-dropped
    doc is dominance-dropped (its kept witness has a smaller id), so
    the kept set is conservative for training-data purposes (never
    keeps a pair closer than the threshold ... any two kept docs are
    below it under BOTH rules). For one-per-group semantics over
    transitive chains use :func:`~..dedup.near_dup_clusters`-style
    components on the pair graph instead.
    """
    pairs = semantic_dup_pairs(
        vectors, centroids, threshold, id_col=id_col, vec_col=vec_col,
        centroid_id_col=centroid_id_col,
    )
    assign = assign_to_centroids(
        vectors, centroids, id_col=id_col, vec_col=vec_col,
        centroid_id_col=centroid_id_col,
    )
    dropped = pairs.select(F.col("id_b").alias("id")).distinct()
    return assign.join(dropped, "id", "left_anti")
