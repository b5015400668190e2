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


def kmeans_centroids(embeddings: DataFrame, n_clusters: int = 16,
                     n_iters: int = 4) -> list:
    """Deterministic Lloyd iterations for the IVF coarse quantizer.

    Init: the ``n_clusters`` vectors with the smallest md5(vec_id) (a
    seedless deterministic sample). Assignment is an Arrow-batched numpy
    matmul against the broadcast centroid matrix; the recompute step is a
    per-(cluster, dim) mean via posexplode + hash agg (fully distributed —
    only the k×dim centroid matrix ever reaches the driver).
    """
    import hashlib

    import numpy as np

    seed_ids = embeddings.select(
        "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h")
    ).orderBy("h").limit(n_clusters)
    init = (
        embeddings.join(seed_ids.select("vec_id"), "vec_id")
        .select("vec_id", "embedding").orderBy("vec_id").collect()
    )
    centroids = np.array([np.asarray(r.embedding, dtype=np.float64) for r in init])

    for _ in range(n_iters):
        assigned = assign_clusters(embeddings, centroids)
        dims = (
            embeddings.join(assigned, "vec_id")
            .select("cluster", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("cluster", "dim").agg(F.avg("x").alias("m"))
            .collect()
        )
        new = centroids.copy()
        for r in dims:
            new[r.cluster, r.dim] = r.m
        centroids = new
    return centroids.tolist()


ASSIGN_SCHEMA = "vec_id long, cluster int"


def assign_clusters(embeddings: DataFrame, centroids) -> DataFrame:
    """vec → nearest centroid (L2), numpy per Arrow batch."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)

    def run(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "cluster": []})
                continue
            M = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].astype("int64"),
                                "cluster": d2.argmin(axis=1).astype("int32")})

    return embeddings.select("vec_id", "embedding").mapInPandas(run, schema=ASSIGN_SCHEMA)


def ivf_topk(embeddings: DataFrame, n_queries: int = 5, k: int = 10,
             n_clusters: int = 16, nprobe: int = 4) -> DataFrame:
    """IVF ANN: coarse-quantize candidates into inverted lists; each query
    scores only the ``nprobe`` nearest lists. Same output shape as
    cosine_topk. At warehouse scale the cluster assignment is a write-time
    partition column, so a probe is a partition-pruned scan."""
    import numpy as np

    centroids = kmeans_centroids(embeddings, n_clusters)
    C = np.asarray(centroids)

    cand = embeddings.filter(F.col("vec_id") >= n_queries)
    cand_assign = assign_clusters(cand, centroids)
    cands = cand.join(cand_assign, "vec_id").select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"), "cluster")

    q_rows = embeddings.filter(F.col("vec_id") < n_queries) \
        .select("vec_id", "embedding").collect()
    probe_rows = []
    for r in q_rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        order = (((C - v) ** 2).sum(axis=1)).argsort()[:nprobe]
        for cl in order:
            probe_rows.append((int(r.vec_id), int(cl)))
    probes = embeddings.sparkSession.createDataFrame(
        probe_rows, "q_id long, cluster int")
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))

    scored = (
        F.broadcast(probes.join(q, "q_id")).join(cands, "cluster")
        .withColumn("sim", F.round(_dot("q_emb", "c_emb") / (_norm("q_emb") * _norm("c_emb")), 6))
        .select("q_id", "c_id", "sim").distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


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
