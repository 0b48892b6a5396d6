"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  Dot products via F.zip_with + F.aggregate (JVM-side, codegen'd); the
  join is queries × vectors, so use it for small query sets or as the
  per-bucket kernel.
- ``lsh_topk``: random-hyperplane LSH — sign-bit signature buckets,
  probe only the query's bucket(s). The scale path: candidate set per
  query is O(bucket), not O(n). Recall < 1 by construction; raise
  ``planes``/``probes`` to trade cost for recall.
- ``ivf_topk``: IVF-style coarse quantizer — assign vectors to the
  nearest of k centroids (a broadcast dim table), probe the ``nprobe``
  nearest centroids per query.

Hyperplanes/centroids are deterministic (seeded numpy) and broadcast —
tiny dimension tables, never a shuffle of the big side beyond the final
per-query top-k window.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: DataFrame[query_id, vec_id, cos, rank]."""
    v = vectors.select(F.col(id_col), F.col(vec_col).alias("_v"))
    q = queries.select(F.col(query_id_col), F.col(query_vec_col).alias("_q"))
    scored = q.crossJoin(v).select(
        query_id_col, id_col, cosine(F.col("_q"), F.col("_v")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((planes, dim)).tolist()


def _signature(vec_col, hyperplanes: list[list[float]]):
    bits = None
    for i, h in enumerate(hyperplanes):
        arr = F.array(*[F.lit(float(x)) for x in h])
        bit = F.when(_dot(vec_col, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits.bitwiseOR(bit)
    return bits.cast("long")


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int | None = None,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k probing only the query's sign bucket."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    hp = _hyperplanes(dim, planes, seed)
    v = vectors.select(
        F.col(id_col), F.col(vec_col).alias("_v"), _signature(F.col(vec_col), hp).alias("_sig")
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).alias("_q"),
        _signature(F.col(query_vec_col), hp).alias("_sig"),
    )
    scored = q.join(v, "_sig").select(
        query_id_col, id_col, cosine(F.col("_q"), F.col("_v")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def train_centroids(
    vectors: DataFrame, n_centroids: int = 16, vec_col: str = "embedding",
    sample: int = 2048, iters: int = 5, seed: int = 42,
) -> list[list[float]]:
    """Mini k-means on a driver-side sample (numpy Lloyd iterations).

    The sample is bounded (default 2048 rows) — at 100 TB the training
    set is still a constant-size sample; assignment below stays fully
    distributed."""
    pdf = vectors.select(vec_col).limit(sample).toPandas()
    x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents.tolist()


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: vectors assigned to nearest centroid (broadcast dim);
    each query probes its ``nprobe`` nearest centroids' lists."""
    cents = train_centroids(vectors, n_centroids, vec_col, seed=seed)
    spark = vectors.sparkSession
    cdf = F.broadcast(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cid int, cvec array<double>"
        )
    )
    v = vectors.select(F.col(id_col), F.col(vec_col).alias("_v"))
    v_assign = (
        v.crossJoin(cdf)
        .select(id_col, "_v", "cid", cosine(F.col("_v"), F.col("cvec")).alias("_cc"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cc"), F.asc("cid"))
    v_best = (
        v_assign.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "_v", "cid")
    )
    q = queries.select(F.col(query_id_col), F.col(query_vec_col).alias("_q"))
    q_assign = (
        q.crossJoin(cdf)
        .select(query_id_col, "_q", "cid", cosine(F.col("_q"), F.col("cvec")).alias("_cc"))
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("_cc"), F.asc("cid"))
    q_probe = (
        q_assign.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, "_q", "cid")
    )
    scored = q_probe.join(v_best, "cid").select(
        query_id_col, id_col, cosine(F.col("_q"), F.col("_v")).alias("cos")
    )
    wk = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(wk)).filter(F.col("rank") <= k)
