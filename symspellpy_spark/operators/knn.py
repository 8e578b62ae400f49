"""Similarity search over embedding columns (``array<float>``).

Two paths, per the training-data-pipeline requirements:
- :func:`cosine_topk` — exact brute-force top-k (the baseline): dot
  products via zip_with/aggregate, all JVM-side; queries broadcast.
- :func:`lsh_cosine_topk` — the scale path: random-hyperplane (sign)
  LSH buckets candidates first, so each query only scores vectors
  sharing a bucket; exact cosine re-rank inside candidates. Multi-probe
  via several independent tables keeps recall high.

No reference analogue (SURVEY.md §2.6): embeddings are out of scope for
symspellpy; this is the embedding-space twin of its delete-key
candidate-generation -> verify split.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = ["cosine_topk", "lsh_cosine_topk", "hyperplane_signatures"]


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
