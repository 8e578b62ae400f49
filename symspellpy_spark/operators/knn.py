"""Similarity search over embedding columns (``array<float>``).

Three paths, per the training-data-pipeline requirements:
- :func:`cosine_topk` — exact brute-force top-k (the baseline): dot
  products via zip_with/aggregate, all JVM-side; queries broadcast.
- :func:`lsh_cosine_topk` — scale path A: random-hyperplane (sign)
  LSH buckets candidates first, so each query only scores vectors
  sharing a bucket; exact cosine re-rank inside candidates. Multi-probe
  via several independent tables keeps recall high.
- :func:`ivf_cosine_topk` — scale path B: IVF — a sample-trained
  cosine-k-means coarse quantizer partitions the corpus into centroid
  lists; queries probe their n_probe nearest lists and re-rank exactly.
  The list assignment is a natural storage partitioning key at 100 TB.

No reference analogue (SURVEY.md §2.6): embeddings are out of scope for
symspellpy; this is the embedding-space twin of its delete-key
candidate-generation -> verify split.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = [
    "cosine_topk",
    "lsh_cosine_topk",
    "hyperplane_signatures",
    "ivf_fit_centroids",
    "ivf_assign",
    "ivf_cosine_topk",
    "semantic_dedup",
]


def _to_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _cosine(qv, cv):
    dot = F.aggregate(
        F.zip_with(qv, cv, lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda a, v: a + v * v)
    )
    return dot / (norm(qv) * norm(cv))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors: (query_id, neighbor_id, cos, rank).

    Broadcast the (small) query side; the corpus streams. At cluster
    scale this is one pass over the corpus per query batch.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", _cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 99,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``bucket array<long>``: one sign-pattern bucket id per table.

    Random hyperplanes are fixed by (seed, dim); the UDF computes all
    tables' sign patterns with one (batch x dim) @ (dim x tables*bits)
    matmul.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_tables * n_bits))
    weights = (1 << np.arange(n_bits, dtype=np.int64))[None, :]

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vecs):
        out = []
        for v in vecs:
            if v is None:
                out.append([-1] * n_tables)
                continue
            x = np.asarray(v, dtype=np.float64)
            signs = (x @ planes > 0).reshape(n_tables, n_bits)
            ids = (signs * weights.reshape(1, n_bits)).sum(axis=1)
            # offset by table index so buckets never collide across tables
            out.append((ids + (np.arange(n_tables) << np.int64(n_bits))).tolist())
        return pd.Series(out, index=vecs.index)

    return df.withColumn("bucket", _buckets(F.col(vec_col)))


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH candidate buckets + exact
    cosine re-rank within candidates."""
    qs = hyperplane_signatures(
        queries, dim, n_tables, n_bits, seed, vec_col
    ).select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("qv"),
        F.explode("bucket").alias("bucket"),
    )
    cs = hyperplane_signatures(
        corpus, dim, n_tables, n_bits, seed, vec_col
    ).select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("cv"),
        F.explode("bucket").alias("bucket"),
    )
    cand = (
        qs.join(cs, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos", _cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_fit_centroids(
    corpus: DataFrame,
    n_centroids: int = 64,
    sample: int = 20_000,
    iters: int = 10,
    seed: int = 7,
    vec_col: str = "embedding",
) -> np.ndarray:
    """IVF coarse quantizer: spherical k-means on a bounded sample.

    The sample (not the corpus) is collected — index TRAINING is a
    bounded-size driver job by design (FAISS trains IVF on a sample
    too); ASSIGNMENT and SEARCH stay distributed. Deterministic in
    (seed, sample): k-means++-free Lloyd's with seeded init, vectors and
    centroids L2-normalized each round (cosine k-means). The sample is
    taken in xxhash64(vector) order — a bare ``limit`` is not
    deterministic across runs/task retries, which would make centroids
    (hence every assignment) unstable; hash order also decorrelates the
    sample from ingestion order.

    Scale: a ``pmod(hash, K) = 0`` pre-filter (K sized so ~4x the
    sample survives) runs BEFORE the top-k, so the global sort ranks
    ~4*sample rows instead of the whole corpus — at 10^9+ vectors the
    full-corpus top-k was the only non-O(sample) step of training.
    The filter is the same pure hash the ordering uses, so the result
    stays a deterministic function of the data; with a small corpus
    (n <= 4*sample) K=1 and the behavior is byte-identical to the
    unfiltered path. Duplicate vectors share one hash, so on a
    duplicate-heavy corpus (few DISTINCT embeddings) the filtered
    stream can come back short — the 1/K survival estimate assumes
    distinct hashes. The guard below widens the filter PROGRESSIVELY
    (``pmod < m`` with m doubling) whenever it returns fewer than the
    rows the corpus could supply, so slight duplication costs one or
    two retries over a still-1/K-ish slice instead of silently
    degrading to a full-corpus sort; the unfiltered top-k remains only
    the m >= K last resort. Each widening is a pure function of the
    data, so centroids stay deterministic in (data, seed, sample).
    """
    n_corpus = corpus.count()
    need = min(sample, n_corpus)
    k_div = max(1, n_corpus // max(1, sample * 4))
    h = F.xxhash64(F.col(vec_col).cast("string"))
    sampled = corpus.select(F.col(vec_col), h.alias("_h"))
    m = 1
    while True:
        src = (
            sampled.where(F.pmod(F.col("_h"), F.lit(k_div)) < m)
            if m < k_div
            else sampled
        )
        rows = src.orderBy("_h").limit(sample).toPandas()[vec_col].tolist()
        if len(rows) >= need or m >= k_div:
            break
        m *= 2
    x = np.asarray(rows, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cents[c] = v / n
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id_col, vec (double), centroid_id) with ``n_probe`` rows per
    vector (nearest centroids by cosine). One Arrow-batched matmul per
    batch; the corpus side uses n_probe=1 (each vector lives in ONE
    list), query sides probe several."""
    cents = centroids
    bc_holder = {}

    @F.pandas_udf(ArrayType(LongType()))
    def _nearest(vecs):
        c = bc_holder.get("c")
        if c is None:
            c = np.asarray(cents, dtype=np.float64)
            bc_holder["c"] = c
        out = []
        for v in vecs:
            if v is None:
                out.append([])
                continue
            x = np.asarray(v, dtype=np.float64)
            n = np.linalg.norm(x)
            if n > 1e-12:
                x = x / n
            sims = x @ c.T
            top = np.argsort(-sims)[:n_probe]
            out.append([int(t) for t in top])
        return pd.Series(out, index=vecs.index)

    return df.select(
        F.col(id_col),
        _to_double(F.col(vec_col)).alias("vec"),
        F.explode(_nearest(F.col(vec_col))).alias("centroid_id"),
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_list_size: int | None = None,
) -> DataFrame:
    """Semantic (embedding-space) deduplication, SemDeDup-shaped
    (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus with the
    IVF coarse quantizer (one list per vector), compare vectors only
    WITHIN their list, and drop every vector that has a within-list
    neighbor with cosine >= ``threshold`` and a smaller id — i.e. the
    smallest id of each semantic-duplicate group survives
    (deterministic, so reruns/retries keep the same corpus; the paper
    keeps a random/centroid-distance representative, which is not
    replayable).

    -> ``(id_col, centroid_id, kept)`` — one row per input vector.

    Scale shape: the pairwise compare is confined to a list (the same
    bucket-join pattern as LSH candidate pairs — never an all-pairs
    cross join); lists are the natural storage partitioning key. A
    degenerate hot list (a boilerplate embedding cluster) is bounded by
    ``max_list_size``: members compare only against the list's
    ``max_list_size`` smallest ids, capping the join at O(list * cap).
    That is the same bounded-cost/recall trade as LSH's
    ``max_bucket_size``: a near-duplicate of any of the cap's ids is
    still dropped; a duplicate GROUP lying entirely beyond the cap can
    survive — size the cap at the quantizer's expected list size (or
    leave it None) when full within-list recall is required. The
    assignment relation feeds three consumers (both join sides and the
    kept-flag output), so it is persisted for the duration of the call —
    the corpus is scanned and assigned once, not three times.
    """
    from symspellpy_spark.operators.scoped_cache import persist_scoped

    assigned = persist_scoped(
        ivf_assign(corpus, centroids, 1, id_col, vec_col),
        "semantic_dedup.assigned",
    )
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col("vec").alias("va"), "centroid_id"
    )
    if max_list_size is not None:
        w_cap = Window.partitionBy("centroid_id").orderBy("id_a")
        a = (
            a.withColumn("_rn", F.row_number().over(w_cap))
            .where(F.col("_rn") <= max_list_size)
            .drop("_rn")
        )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col("vec").alias("vb"), "centroid_id"
    )
    dropped = (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(_cosine(F.col("va"), F.col("vb")) >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assigned.select(id_col, "centroid_id")
        .join(dropped.withColumn("_dup", F.lit(True)), id_col, "left")
        .select(
            id_col, "centroid_id", F.col("_dup").isNull().alias("kept")
        )
    )


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF index: corpus partitioned into
    centroid lists (one list per vector), queries probe their
    ``n_probe`` nearest lists, exact cosine re-rank inside the probed
    lists. The centroid equi-join replaces the brute-force cross join —
    at 100 TB the corpus side can additionally be WRITTEN partitioned by
    ``centroid_id`` so a probe prunes to n_probe/k of the files."""
    qs = ivf_assign(queries, centroids, n_probe, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("vec").alias("qv"),
        "centroid_id",
    )
    cs = ivf_assign(corpus, centroids, 1, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vec").alias("cv"),
        "centroid_id",
    )
    cand = (
        qs.join(cs, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", _cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
