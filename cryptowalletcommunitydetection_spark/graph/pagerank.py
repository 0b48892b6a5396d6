"""PageRank as iterative scatter/gather DataFrame joins.

North-rule extension of the reference's clustering workload (SURVEY.md
§2.9 G6): same superstep/checkpoint machinery as connected components,
NetworkX-compatible semantics so ``nx.pagerank(alpha=0.85)`` is the test
oracle — per-vertex agreement within atol 1e-6:

  x_{k+1}(v) = (1-α)/N + α·( Σ_{u→v} x_k(u)·w(u,v)/W(u) + D_k/N )

with W(u) the out-weight sum, D_k the total rank mass on dangling
(out-degree-0) vertices, and L1 convergence Σ|x_{k+1}-x_k| < tol.

Scale design:
- the transition table ``norm_edges(src, dst, p)`` is computed once,
  hash-partitioned by src, persisted — supersteps never reshuffle the
  edge table on the scatter side,
- the rank table is |V| rows; when small it is broadcast to the edge
  partitions (zero-shuffle scatter), otherwise joined co-partitioned,
- the gather ``groupBy(dst).sum`` benefits from map-side partial
  aggregation, which neutralizes hub skew for algebraic aggregates
  (explicit salting helpers in graph/skew.py cover non-algebraic cases),
- each superstep is checkpointed (Parquet) → lineage stays O(1) and the
  run resumes from the last complete superstep.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.checkpoint import RunManifest
from .edges import canonicalize_edges, symmetrize, vertices_of

# Above this vertex count the rank table is no longer broadcast.
BROADCAST_MAX_VERTICES = 2_000_000


@dataclass
class PageRankResult:
    ranks: DataFrame
    supersteps: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 300,
    weighted: bool = True,
    directed: bool = False,
    vertices: DataFrame | None = None,
    run_dir: str | None = None,
    strategy: str = "auto",
    num_partitions: int | None = None,
) -> PageRankResult:
    """Iterative PageRank. ``edges``: src, dst [, weight].

    ``directed=False`` treats the input as canonical undirected edges and
    symmetrizes (NetworkX Graph semantics). ``tol`` is the absolute L1
    threshold on Σ|Δrank|. ``strategy``: "broadcast" | "copartition" |
    "auto" (broadcast while |V| ≤ 2M).
    """
    has_w = weighted and "weight" in edges.columns
    if directed:
        e = edges
        if not has_w:
            e = e.select("src", "dst", F.lit(1).alias("weight"))
    else:
        # nx.Graph semantics: duplicate rows / reversed orientations
        # collapse to one undirected edge (weights summed when weighted)
        canon = canonicalize_edges(edges, weight="weight" if has_w else None)
        if not has_w:
            canon = canon.select("src", "dst", F.lit(1).alias("weight"))
        e = symmetrize(canon, weight=True)

    verts = vertices_of(e)
    if vertices is not None:
        verts = verts.unionByName(vertices.select("id")).distinct()
    verts = verts.persist(StorageLevel.MEMORY_AND_DISK)
    n = verts.count()
    if n == 0:
        return PageRankResult(verts.select("id", F.lit(0.0).alias("rank")), 0, True)

    np = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    broadcast_ranks = strategy == "broadcast" or (
        strategy == "auto" and n <= BROADCAST_MAX_VERTICES
    )
    out_w = e.groupBy("src").agg(F.sum("weight").alias("_wsum"))
    # Partitioning of the persisted transition table:
    # - broadcast strategy: the scatter join is map-side, so partition by
    #   dst — the gather's map-side partial agg then emits exactly one
    #   row per dst per partition and the shuffle moves ~|V| rows,
    # - copartition strategy: partition by src so the rank join is
    #   co-partitioned.
    part_key = "dst" if broadcast_ranks else "src"
    norm_edges = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("_wsum")).alias("p"))
        .repartition(np, part_key)
    )
    if not broadcast_ranks:
        # pre-sort by src so the per-superstep sort-merge scatter join
        # streams the (large) cached edge side without re-sorting it
        norm_edges = norm_edges.sortWithinPartitions("src")
    norm_edges = norm_edges.persist(StorageLevel.MEMORY_AND_DISK)
    norm_edges.count()  # materialize once

    dangling = verts.join(
        norm_edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_dangling = dangling.count()

    manifest = None
    start_k = 0
    ranks = verts.select("id", F.lit(1.0 / n).alias("rank"))
    # max_iter is a stopping condition, not part of the computation's
    # identity — a resume may raise it and continue the same run.
    params = {
        "alpha": alpha, "tol": tol,
        "weighted": has_w, "directed": directed, "n": n,
    }
    if run_dir is not None:
        manifest = RunManifest.open_or_create(run_dir, "pagerank", params)
        last = manifest.last_complete()
        if last >= 0:
            ranks = manifest.load_state(spark, last).select("id", "rank")
            start_k = last + 1
            done = [
                s for s in manifest.supersteps
                if s["k"] == last and s.get("delta") is not None and s["delta"] < tol
            ]
            if done:
                return PageRankResult(ranks, last + 1, True, manifest.metrics())
    ranks = ranks.localCheckpoint(eager=True) if manifest is None else ranks

    converged = False
    steps = start_k
    local_metrics: list[dict] = []
    for k in range(start_k, max_iter):
        t0 = time.monotonic()
        # copartition mode: no explicit repartition — the rank table is
        # |V| rows (cheap to shuffle when needed) and its checkpointed
        # partitioning from the previous superstep's join is preserved,
        # so Catalyst plans the scatter join against the pre-partitioned,
        # pre-sorted edge table without touching the edge side
        r = F.broadcast(ranks) if broadcast_ranks else ranks

        contrib = (
            norm_edges.join(r, norm_edges.src == r.id)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("_c"))
        )
        if n_dangling > 0:
            dmass = (
                ranks.join(dangling, "id", "left_semi")
                .agg(F.sum("rank"))
                .collect()[0][0]
                or 0.0
            )
        else:
            dmass = 0.0
        base = (1.0 - alpha) / n + alpha * dmass / n
        # join contrib back to the rank table (covers every vertex) and
        # carry the previous rank along — the L1 delta then needs no
        # second |V|⋈|V| join, just a single-stage agg over the
        # checkpointed result (one fewer shuffle per superstep)
        new_ranks = ranks.join(contrib, ranks.id == contrib.dst, "left").select(
            ranks.id.alias("id"),
            (F.lit(base) + F.lit(alpha) * F.coalesce(F.col("_c"), F.lit(0.0))).alias(
                "rank"
            ),
            F.col("rank").alias("_old"),
        )
        if manifest is not None:
            new_ranks = manifest.checkpoint(new_ranks, k)
        else:
            # lazy local checkpoint: the delta agg below is the action
            # that computes AND pins the superstep state — one Spark job
            # per superstep instead of two
            new_ranks = new_ranks.localCheckpoint(eager=False)

        delta = (
            new_ranks.agg(F.sum(F.abs(F.col("rank") - F.col("_old")))).collect()[0][0]
        )
        wall_ms = (time.monotonic() - t0) * 1e3
        entry = {"k": k, "wall_ms": wall_ms, "delta": delta, "rows": n}
        local_metrics.append(entry)
        if manifest is not None:
            manifest.record_superstep(
                spark, k, wall_ms=wall_ms, delta=delta, rows=n,
                extra={"dangling_mass": dmass},
            )
        ranks = new_ranks.select("id", "rank")
        steps = k + 1
        if delta < tol:
            converged = True
            break

    metrics = manifest.metrics() if manifest is not None else local_metrics
    return PageRankResult(ranks, steps, converged, metrics)
