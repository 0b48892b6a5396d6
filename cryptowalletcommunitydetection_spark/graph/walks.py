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

_COIN_DENOM = 1 << 53
"""Hash-coin resolution: xxhash64 folded into [0, 1) at double
precision (2^53 distinguishable values — the full double mantissa)."""

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


def alias_tables(edges: DataFrame, assume_canonical: bool = False) -> DataFrame:
    """Walker alias tables for weighted neighbor sampling:
    DataFrame[src, rank, dst, prob, alias_dst].

    Per source vertex with K neighbors of weights w_i, the table has K
    rows; drawing ``rank ~ U{0..K-1}`` and a coin ``u ~ U[0,1)`` then
    yields ``dst`` if ``u < prob`` else ``alias_dst`` — exactly the
    w_i/ΣW marginal (Walker 1977; the invariant is unit-tested
    numerically, not statistically). This keeps weighted transitions
    O(1) per walk step: the inverse-CDF alternative needs a range join
    against per-vertex cumulative weights, which re-introduces the
    neighbor-list fan-out the rank join avoids.

    Built with one ``applyInPandas`` over the symmetrized weighted
    adjacency grouped by source — O(K) per vertex (the classic
    two-stack construction), deterministic (neighbors sorted by id
    before ranking, stack order index-driven). A 10^7-degree hub is one
    O(K) group in one task — linear work and memory, the documented
    bound; the construction is one-time per graph and reusable across
    corpora via the ``adjacency`` argument of ``random_walks``.

    Input needs a ``weight`` column (missing -> multiplicity weight 1
    per canonical edge via ``canonicalize_edges``)."""
    if assume_canonical:
        canon = edges
        if "weight" not in canon.columns:
            canon = canon.withColumn("weight", F.lit(1.0))
    else:
        canon = canonicalize_edges(
            edges, weight="weight" if "weight" in edges.columns else None
        )
    sym = symmetrize(canon.select("src", "dst", F.col("weight").cast("double")
                                  .alias("weight")), weight=True)
    src_t = sym.schema["src"].dataType.simpleString()
    dst_t = sym.schema["dst"].dataType.simpleString()
    schema = (
        f"src {src_t}, rank int, dst {dst_t}, prob double, alias_dst {dst_t}"
    )

    def build(pdf):
        import numpy as np

        pdf = pdf.sort_values("dst").reset_index(drop=True)
        w = pdf["weight"].to_numpy(dtype="float64")
        k = len(w)
        scaled = w * (k / w.sum())
        prob = np.ones(k, dtype="float64")
        alias = np.arange(k, dtype="int64")
        small = [i for i in range(k) if scaled[i] < 1.0]
        large = [i for i in range(k) if scaled[i] >= 1.0]
        while small and large:
            s, l = small.pop(), large.pop()
            prob[s] = scaled[s]
            alias[s] = l
            scaled[l] -= 1.0 - scaled[s]
            (small if scaled[l] < 1.0 else large).append(l)
        out = pdf[["src", "dst"]].copy()
        out["rank"] = np.arange(k, dtype="int64")
        out["prob"] = prob
        out["alias_dst"] = pdf["dst"].to_numpy()[alias]
        return out[["src", "rank", "dst", "prob", "alias_dst"]]

    return sym.groupBy("src").applyInPandas(build, schema)


def random_walks(
    edges: DataFrame,
    num_walks: int = 10,
    walk_length: int = 20,
    seed: int = 42,
    assume_canonical: bool = False,
    starts: DataFrame | None = None,
    weighted: bool = False,
) -> DataFrame:
    """DeepWalk corpus: DataFrame[walk_id, start, seq].

    ``seq`` is an ``array`` of ``walk_length`` vertex ids beginning at
    ``start``; ``walk_id`` is ``<start>#<walk index>``. By default one
    batch of ``num_walks`` walks starts at every vertex of the edge
    table; pass ``starts`` (DataFrame[id]) to restrict the start set
    (e.g. walks from one community only). Start vertices must appear in
    the edge table (isolated vertices have no transition distribution).

    ``weighted=True`` samples each step proportionally to edge weight
    through Walker alias tables (see ``alias_tables``) — still one
    constant-width join per step (rank pick + hash coin between the two
    stored outcomes), never a fan-out over the neighbor list.

    Deterministic: the step-t transition of a walk is driven by
    ``xxhash64(walk_id, t, seed)`` (plus an independent
    ``xxhash64(walk_id, t, seed, 'coin')`` coin in weighted mode) —
    same (edges, num_walks, walk_length, seed) → identical corpus, on
    any partitioning or cluster size.
    """
    if walk_length < 1:
        raise ValueError("walk_length must be >= 1")
    if num_walks < 1:
        raise ValueError("num_walks must be >= 1")

    if assume_canonical:
        canon = edges
    else:
        canon = canonicalize_edges(
            edges, weight="weight" if weighted and "weight" in edges.columns else None
        )
    canon = canon.persist()  # consumed by adjacency, degrees, and starts
    adj = (
        alias_tables(canon, assume_canonical=True)
        if weighted
        else ranked_adjacency(canon, assume_canonical=True)
    ).persist()
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
            joined = with_choice.join(
                adj,
                (with_choice["cur"] == adj["src"])
                & (with_choice["choice"] == adj["rank"]),
            )
            if weighted:
                coin = (
                    F.pmod(
                        F.xxhash64(
                            F.col("walk_id"), F.lit(t), F.lit(seed), F.lit("coin")
                        ),
                        F.lit(_COIN_DENOM),
                    )
                    / F.lit(float(_COIN_DENOM))
                )
                nxt = F.when(coin < F.col("prob"), F.col("dst")).otherwise(
                    F.col("alias_dst")
                )
            else:
                nxt = F.col("dst")
            frontier = joined.select("walk_id", "start", nxt.alias("cur"))
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


def skipgram_pairs(corpus: DataFrame, window: int = 5) -> DataFrame:
    """(center, context) training pairs from a walk corpus:
    DataFrame[walk_id, center, context].

    For every position i of every walk sequence, emits one row per
    other position within ``window`` of i (both sides, clipped at the
    sequence ends) — the skip-gram extraction Word2Vec-style trainers
    consume. Entirely JVM array expressions (posexplode + slice +
    posexplode): no shuffle at all beyond the corpus scan, ~2·window
    output rows per corpus token. Repeated vertices inside a window
    emit repeated pairs (they are distinct co-occurrence events); only
    the center POSITION itself is excluded.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    ex = corpus.select(
        "walk_id",
        F.posexplode("seq").alias("pos", "center"),
        F.col("seq"),
    )
    # 1-based slice bounds around the center (1-based position pos+1)
    lo = F.greatest(F.lit(1), F.col("pos") + 1 - F.lit(window))
    length = F.col("pos") + 1 + F.lit(window) - lo + 1  # clipped by slice
    ctx = ex.select(
        "walk_id",
        "pos",
        "center",
        lo.alias("lo"),
        F.posexplode(F.slice("seq", lo, length)).alias("off", "context"),
    )
    return ctx.filter(F.col("lo") + F.col("off") != F.col("pos") + 1).select(
        "walk_id", "center", "context"
    )
