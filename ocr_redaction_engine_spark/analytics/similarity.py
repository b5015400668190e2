"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine_topk` — brute-force baseline: pure Catalyst (zip_with +
  aggregate higher-order functions; codegen'd, no Python). O(Q·N) — the
  correctness reference and fine for Q small.
* :func:`lsh_bucketed_topk` — the scale path: deterministic random-hyperplane
  LSH (sign bits of dot products with md5-seeded hyperplanes) buckets
  vectors, then only same-bucket pairs are scored. Bucketing is an
  Arrow-batched numpy matmul; scoring reuses the same JVM cosine expression.
  At 100 TB embeddings the bucket join replaces the cross join; recall is
  tunable via (n_planes, n_tables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: str | Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Top-k cosine neighbours among vec_id >= n_queries for each query
    vec_id < n_queries. Deterministic tie-break (sim desc, vec_id asc)."""
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .withColumn("sim", F.round(_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6))
        .select("q_id", "c_id", "sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_pairs(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).
    Brute-force upper-triangle cross join in double precision — the
    correctness baseline; at scale, restrict candidates with lsh_buckets and
    join on bucket instead of the cross join."""
    def side(prefix: str) -> DataFrame:
        return embeddings.select(
            F.col("vec_id").alias(f"{prefix}_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias(f"{prefix}_emb"),
        )

    a, b = side("a"), side("b")
    return (
        F.broadcast(a).crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("sim", F.round(_dot("a_emb", "b_emb") / (_norm("a_emb") * _norm("b_emb")), 6))
        .filter(F.col("sim") >= threshold)
        .select(F.col("a_id").alias("a"), F.col("b_id").alias("b"), "sim")
    )


BUCKET_SCHEMA = "vec_id long, bucket long"


def lsh_buckets(embeddings: DataFrame, n_planes: int = 12, seed: int = 7) -> DataFrame:
    """Random-hyperplane bucket id per vector — deterministic (md5-seeded
    hyperplanes, pure function of (seed, plane, dim))."""
    import hashlib

    import numpy as np
    import pandas as pd

    def planes(dim: int) -> "np.ndarray":
        vals = np.empty((n_planes, dim))
        for p in range(n_planes):
            for d in range(dim):
                h = int.from_bytes(
                    hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[:8], "big")
                vals[p, d] = h / 2**63 - 1.0
        return vals

    def run(batches):
        H = None
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "bucket": []})
                continue
            M = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            if H is None:
                H = planes(M.shape[1])
            bits = (M @ H.T) > 0
            bucket = bits.dot(1 << np.arange(n_planes, dtype=np.int64))
            yield pd.DataFrame({"vec_id": pdf["vec_id"].astype("int64"),
                                "bucket": bucket.astype("int64")})

    return embeddings.select("vec_id", "embedding").mapInPandas(run, schema=BUCKET_SCHEMA)


def lsh_bucketed_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10,
                      n_planes: int = 8) -> DataFrame:
    """ANN: score only same-bucket pairs. Same output shape as cosine_topk
    (rank within retrieved candidates)."""
    b = lsh_buckets(embeddings, n_planes)
    e = embeddings.join(b, "vec_id")
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), "bucket")
    c = e.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"), "bucket")
    scored = (
        q.join(c, "bucket")
        .withColumn("sim", F.round(_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6))
        .select("q_id", "c_id", "sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
