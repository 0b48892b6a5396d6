"""Random-walk corpus generation (DeepWalk-style) over the edge table.

Training-data-pipeline extension of the link-graph engine (SURVEY.md
§2.9/§2.10): the reference clusters wallets from the static graph
(`/root/reference/services/wallet_clustering.py`); the modern
large-scale successor to that workflow trains vertex embeddings
(DeepWalk / node2vec) from random-walk corpora and clusters in the
embedding space. This module produces that corpus — W walks of length L
per vertex — as a DataFrame, ready to feed a Word2Vec-style trainer or
the engine's own embedding-similarity operators
(operators/similarity.py).

Scale design — the three decisions that make this 100-TB-shaped:

1. **Rank-indexed adjacency, not neighbor arrays.** A hub with 10^7
   neighbors would make a ``collect_list`` adjacency row gigabytes
   wide. Instead the adjacency stays one ROW per directed edge with a
   dense per-source ``rank`` column (one window over the symmetrized
   edge table, computed once), plus a |V|-row degree table. Choosing a
   neighbor is an equi-join on ``(src, rank)`` that touches exactly one
   adjacency row per walk per step — never a fan-out over the full
   neighbor list.
2. **Hash-derived choices, not RNG state.** The step-t choice for a
   walk is ``xxhash64(walk_id, t, seed) mod degree(cur)`` — a pure
   column expression. No RNG state rides the shuffle, every step is
   deterministically replayable (same seed → identical corpus on any
   partitioning — the same idempotence contract the supersteps of
   graph/pagerank.py keep for resume), and the "randomness" is as good
   as the hash (xxhash64 avalanche).
3. **Hub skew self-mitigates.** The per-step adjacency join key is
   ``(cur, choice_rank)``; the many walks sitting on a hub at step t
   hash to *different* ranks, so they spread across the hub's edge rows
   instead of colliding on one key. The degree join does collide on the
   hub id, but that side is a |V|-row table of two columns — broadcast
   or AQE-handled.

Each step is two shuffle joins of the constant-width walk frontier
(|starts|·num_walks rows) — degree lookup, then single-row adjacency
lookup — O(L) supersteps total, the same iterative-join shape as
PageRank/CC/LPA. Step outputs accumulate as (walk_id, step, vertex)
rows and are assembled into sequences by one final group, so the
frontier never carries an O(t) prefix array through the exchanges.
Lineage is cut with ``localCheckpoint`` every few supersteps (same
rationale as the other iterative operators: unbounded plan growth
re-plans from scratch each step and eventually stalls the driver).

Walks on the symmetrized undirected graph never hit a dead end (every
vertex that appears in an edge has degree >= 1 in both directions), so
all sequences have exactly ``walk_length`` vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .edges import canonicalize_edges, degrees, symmetrize

_CHECKPOINT_EVERY = 8
"""Supersteps between lineage cuts on the walk frontier."""


def ranked_adjacency(edges: DataFrame, assume_canonical: bool = False) -> DataFrame:
    """DataFrame[src, dst, rank] — both orientations of the undirected
    graph with a dense 0-based neighbor rank per source.

    ``rank`` orders neighbors by id, so it is deterministic for a given
    edge set regardless of input partitioning. One exchange (the window
    partitioned by ``src``).
    """
    canon = edges.select("src", "dst") if assume_canonical else (
        canonicalize_edges(edges).select("src", "dst")
    )
    sym = symmetrize(canon, weight=False)
    w = Window.partitionBy("src").orderBy("dst")
    return sym.select(
        "src", "dst", (F.row_number().over(w) - F.lit(1)).alias("rank")
    )


def random_walks(
    edges: DataFrame,
    num_walks: int = 10,
    walk_length: int = 20,
    seed: int = 42,
    assume_canonical: bool = False,
    starts: DataFrame | None = None,
) -> DataFrame:
    """DeepWalk corpus: DataFrame[walk_id, start, seq].

    ``seq`` is an ``array`` of ``walk_length`` vertex ids beginning at
    ``start``; ``walk_id`` is ``<start>#<walk index>``. By default one
    batch of ``num_walks`` walks starts at every vertex of the edge
    table; pass ``starts`` (DataFrame[id]) to restrict the start set
    (e.g. walks from one community only). Start vertices must appear in
    the edge table (isolated vertices have no transition distribution).

    Deterministic: the step-t transition of a walk is neighbor
    ``xxhash64(walk_id, t, seed) mod degree`` of the current vertex —
    same (edges, num_walks, walk_length, seed) → identical corpus, on
    any partitioning or cluster size.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if num_walks < 1:
        raise ValueError("num_walks must be >= 1")

    canon = edges.select("src", "dst") if assume_canonical else (
        canonicalize_edges(edges).select("src", "dst")
    )
    canon = canon.persist()  # consumed by adjacency, degrees, and starts
    adj = ranked_adjacency(canon, assume_canonical=True).persist()
    # symmetrized out-degree == undirected degree; two narrow columns,
    # |V| rows — the hot-loop lookup side
    deg = degrees(canon).persist()
    try:
        verts = (
            starts.select(F.col("id"))
            if starts is not None
            else deg.select("id")
        )
        frontier = verts.select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(num_walks - 1))).alias(
                "walk_idx"
            ),
        ).select(
            F.concat_ws("#", F.col("id").cast("string"), F.col("walk_idx"))
            .alias("walk_id"),
            F.col("id").alias("start"),
            F.col("id").alias("cur"),
        )

        # step tables accumulate as constant-width (walk_id, step, vertex)
        # rows; the frontier itself never carries the prefix
        steps = [
            frontier.select(
                "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex")
            )
        ]
        for t in range(1, walk_length):
            # 1) resolve the current vertex's degree (|V|-row dim join),
            # 2) hash a rank, 3) fetch exactly that adjacency row
            with_choice = (
                frontier.join(deg, frontier["cur"] == deg["id"])
                .select(
                    "walk_id",
                    "start",
                    "cur",
                    F.pmod(
                        F.xxhash64(F.col("walk_id"), F.lit(t), F.lit(seed)),
                        F.col("degree"),
                    ).cast("int").alias("choice"),
                )
            )
            frontier = (
                with_choice.join(
                    adj,
                    (with_choice["cur"] == adj["src"])
                    & (with_choice["choice"] == adj["rank"]),
                )
                .select("walk_id", "start", F.col("dst").alias("cur"))
            )
            if t % _CHECKPOINT_EVERY == 0:
                frontier = frontier.localCheckpoint(eager=False)
            steps.append(
                frontier.select(
                    "walk_id", F.lit(t).alias("step"), F.col("cur").alias("vertex")
                )
            )

        long = steps[0]
        for s in steps[1:]:
            long = long.unionByName(s)
        out = (
            long.groupBy("walk_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("step", "vertex"))),
                    lambda s: s["vertex"],
                ).alias("seq")
            )
            .withColumn("start", F.element_at("seq", 1))
            .select("walk_id", "start", "seq")
        )
        # pin before releasing the caches (same pattern as
        # graph/triangles.py triangles_per_vertex)
        return out.localCheckpoint(eager=True)
    finally:
        deg.unpersist()
        adj.unpersist()
        canon.unpersist()
