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
- ``cosine_near_dups``: embedding-cosine near-duplicate *pairs* — the
  dedup-family member over the embedding column. ``method="exact"`` is
  the all-pairs baseline (and the oracle contract); ``method="lsh"``
  buckets by per-band hyperplane sign signatures and exact-verifies
  only in-bucket candidates (precision 1, recall < 1 by construction).

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
    from ..session import right_size

    # the scoring projection streams the vectors side of the broadcast
    # nested-loop join — right-size a narrow scan so the cosines aren't
    # computed on one task (no-op on a wide scan)
    v = right_size(vectors).select(F.col(id_col), F.col(vec_col).alias("_v"))
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


def _plane_dots(vec_col, hyperplanes: list[list[float]]):
    """Array column of per-hyperplane dot products (staged once so sig and
    margins don't recompute the projections)."""
    return F.array(*[
        _dot(vec_col, F.array(*[F.lit(float(x)) for x in h])) for h in hyperplanes
    ])


def _sig_from_dots(dots_col, planes: int):
    """Sign-bit signature from the staged projection array (static shifts
    — the plane count is a compile-time constant)."""
    bits = F.lit(0).cast("long")
    for i in range(planes):
        bits = bits.bitwiseOR(
            F.when(dots_col.getItem(i) >= 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
        )
    return bits


def _probe_subsets(probes: int, planes: int) -> list[tuple[int, ...]]:
    """First ``probes`` subsets of the lowest-margin plane *slots*,
    ordered by (popcount, lexicographic): (), (0,), (1,), (0,1), ...
    The slot->plane mapping is data-dependent (per query); the subset
    pattern is static."""
    m = min(planes, max(1, (max(probes, 1) - 1).bit_length()))
    subsets = sorted(
        (tuple(j for j in range(m) if mask >> j & 1) for mask in range(1 << m)),
        key=lambda s: (len(s), s),
    )
    return subsets[:probes]


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int | None = None,
    planes: int = 8,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    ``probes`` enables multi-probe: each query additionally probes the
    buckets reached by flipping subsets of its lowest-|margin| sign bits
    (the planes it was closest to), trading candidate-set size for
    recall without re-hashing the vector side. probes=1 is the classic
    single-bucket probe.

    ``dim`` should be passed when known (it sizes the deterministic
    hyperplane table); when None it is inferred from the first row of the
    *query* side — the small side, but still one extra Spark job.
    """
    if dim is None:
        row = queries.select(query_vec_col).first()
        # empty query batch: any hyperplane dim yields the correct empty
        # result (the probe explode has no input rows)
        dim = len(row[0]) if row is not None else 1
    hp = _hyperplanes(dim, planes, seed)
    from ..session import right_size

    v = right_size(vectors).select(
        F.col(id_col), F.col(vec_col).alias("_v"),
        _plane_dots(F.col(vec_col), hp).alias("_vd"),
    ).select(id_col, "_v", _sig_from_dots(F.col("_vd"), planes).alias("_sig"))
    q0 = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).alias("_q"),
        _plane_dots(F.col(query_vec_col), hp).alias("_d"),
    )
    # plane indices ordered by |margin| ascending (struct sort: margin
    # first, index tie-break)
    order = F.transform(
        F.array_sort(
            F.zip_with(
                F.col("_d"),
                F.sequence(F.lit(0), F.lit(planes - 1)),
                lambda d, i: F.struct(F.abs(d).alias("m"), i.alias("i")),
            )
        ),
        lambda s: s["i"],
    )
    base = _sig_from_dots(F.col("_d"), planes)
    q1 = q0.select(query_id_col, "_q", base.alias("_sig0"), order.alias("_ord"))
    probe_sigs = []
    for subset in _probe_subsets(probes, planes):
        sig = F.col("_sig0")
        for slot in subset:
            # shiftleft with a Column bit position (the PySpark wrapper
            # only takes a Python int)
            sig = sig.bitwiseXOR(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), F.col("_ord").getItem(slot)
                )
            )
        probe_sigs.append(sig)
    q = q1.select(
        query_id_col, "_q",
        F.explode(F.array_distinct(F.array(*probe_sigs))).alias("_sig"),
    )
    # each vector holds exactly one signature and probe sigs are distinct,
    # so a (query, vector) pair matches at most once — no dedup needed
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
    from ..session import right_size

    v = right_size(vectors).select(F.col(id_col), F.col(vec_col).alias("_v"))
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


def cosine_near_dups(
    vectors: DataFrame,
    threshold: float = 0.9,
    method: str = "lsh",
    bands: int = 8,
    planes: int = 8,
    dim: int | None = None,
    max_bucket: int | None = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: DataFrame[a, b] with
    a < b and cosine(a, b) >= ``threshold``.

    The dedup-family member over an embedding column (the vector
    analogue of minhash_lsh_candidates + verify_exact_jaccard in
    operators/dedup.py; reference analogue: the wallet-pair similarity
    grouping in services/wallet_clustering.py).

    ``method="exact"``: all-pairs enumeration — O(n²) nested-loop join,
    documented correctness baseline and the oracle-gate contract only.

    ``method="lsh"``: the scale path. ``bands`` independent
    random-hyperplane signature tables (seeded ``seed + band``); vectors
    sharing any band's full sign signature become candidates, candidates
    are exact-cosine verified. Precision is exactly 1 (every emitted
    pair is verified); recall < 1 by construction — a >=threshold pair
    whose signs differ in every band is missed. Per-band collision
    probability for angle θ is (1 - θ/π)^planes, so raise ``bands`` /
    lower ``planes`` to trade candidate volume for recall.

    ``max_bucket`` defaults ON (1000), reusing the dedup family's
    representative-chaining cap (operators/dedup.py:_banded_pairs): a
    degenerate bucket of k near-identical vectors emits k rows, not k²,
    preserving the duplicate-group *closure* under connected components
    — but capped buckets' star pairs are verified against the
    representative only, so (like simhash_near_dups) the capped output
    is exhaustive for duplicate groups, not for every individual
    near-pair. Pass ``max_bucket=None`` for exhaustive in-bucket
    enumeration.
    """
    from .dedup import _banded_pairs  # shared bucket-cap machinery

    # stage unit-normalized vectors once per row (double); pair work is
    # then a single dot product instead of dot + two norm folds per pair
    staged = vectors.select(
        F.col(id_col).alias("_id0"),
        F.col(vec_col).alias("_v0"),
        _norm(F.col(vec_col)).alias("_n0"),
    ).select(
        "_id0",
        F.transform("_v0", lambda x: x.cast("double") / F.col("_n0")).alias("_u0"),
    )
    va = staged.select(F.col("_id0").alias("a"), F.col("_u0").alias("_va"))
    vb = staged.select(F.col("_id0").alias("b"), F.col("_u0").alias("_vb"))
    if method == "exact":
        pairs = va.join(vb, F.col("a") < F.col("b"))
        return pairs.select(
            "a", "b", _dot(F.col("_va"), F.col("_vb")).alias("cos")
        ).filter(F.col("cos") >= threshold)
    if method != "lsh":
        raise ValueError(f"unknown method: {method}")
    if dim is None:
        row = vectors.select(vec_col).first()
        dim = len(row[0]) if row is not None else 1
    # all bands' hyperplanes ride as DATA in a broadcast 1-row dim table
    # (array<array<double>>, bands*planes rows of dim floats) — a literal
    # expression tree of bands*planes*dim nodes would dominate analysis/
    # codegen time, and the signature computation stays one transform()
    hp_nested = [
        _hyperplanes(dim, planes, seed + band)[p]
        for band in range(bands)
        for p in range(planes)
    ]
    spark = vectors.sparkSession
    hp_df = F.broadcast(
        spark.createDataFrame([(hp_nested,)], "_hp array<array<double>>")
    )
    dots = F.transform("_hp", lambda h: _dot(F.col(vec_col), h))
    sigs = []
    for band in range(bands):
        sigs.append(
            F.struct(
                F.lit(band).alias("band"),
                _sig_from_dots(
                    F.slice(F.col("_dots"), band * planes + 1, planes), planes
                ).alias("bh"),
            )
        )
    from ..session import right_size

    banded = (
        right_size(vectors).crossJoin(hp_df)
        .select(F.col(id_col).alias("_id"), dots.alias("_dots"))
        .select("_id", F.explode(F.array(*sigs)).alias("bb"))
        .select("_id", "bb.band", "bb.bh")
    )
    cand = _banded_pairs(banded, max_bucket)
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select("a", "b", _dot(F.col("_va"), F.col("_vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
