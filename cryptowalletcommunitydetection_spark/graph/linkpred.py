"""Neighborhood-based link prediction over the canonical edge table.

North-rule extension of the reference's wallet-graph workload
(SURVEY.md §2.9): the reference clusters wallets by OBSERVED
co-occurrence (services/wallet_clustering.py builds components from
seen pairs); link prediction scores the UNSEEN pairs most likely to be
the same actor — the standard follow-up question over the same graph.
Scores are the classic neighborhood measures (Liben-Nowell & Kleinberg
2003; NetworkX twins named per column):

- ``common_neighbors``  |N(a) ∩ N(b)|                  (nx.common_neighbors)
- ``adamic_adar``       Σ_{v ∈ N(a)∩N(b)} 1/ln(deg v)  (nx.adamic_adar_index)
- ``resource_alloc``    Σ_{v ∈ N(a)∩N(b)} 1/deg v      (nx.resource_allocation_index)

Scale design: the wedge enumeration is the only super-linear step — a
center vertex of degree d emits d·(d-1)/2 candidate pairs, so one 10^6-
degree hub would emit 5·10^11 rows. ``max_center_degree`` therefore
defaults ON (same default-on posture as the dedup bucket caps,
operators/dedup.py): hub centers above the cap are excluded from wedge
GENERATION. This is principled for these scores — a hub's contribution
to every pair it witnesses is 1/ln(d) (or 1/d), i.e. exactly the terms
the measures themselves down-weight toward 0 — and it bounds the blowup
to cap²/2 rows per center. Pass ``None`` for the exact full semantics
(the oracle twin in entry_queries mirrors the cap, so gate rows stay
exact either way). Everything else is one map-side-combinable groupBy
on the (a, b) pair key plus an anti-join against the existing edges —
no driver materialization, no per-row Python.

Plan audit (read, not assumed): the cap filter sits on the aggregated
degree table BELOW both wedge-join inputs in the optimized plan, and
the adjacency/degree subplans the self-join references twice
deduplicate physically via exchange reuse (7 ReusedExchange nodes in
the executed AQE plan), so the capped wedge join — not a repeated
derivation — is the dominant cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import canonicalize_edges, symmetrize

DEFAULT_MAX_CENTER_DEGREE = 10_000
"""Wedge-center degree cap, ON by default: one center above this emits
> 5·10^7 pairs. Centers this large contribute ≤ 1/ln(10^4) ≈ 0.1 per
pair — the tail the measures already discount."""


def link_prediction_scores(
    edges: DataFrame,
    assume_canonical: bool = False,
    max_center_degree: int | None = DEFAULT_MAX_CENTER_DEGREE,
    min_common: int = 1,
) -> DataFrame:
    """DataFrame[a, b, common_neighbors, adamic_adar, resource_alloc]
    for every NON-ADJACENT pair (a < b) sharing >= ``min_common``
    common neighbors (adjacent pairs are the training edges — scoring
    them is the classic link-prediction leak).

    ``assume_canonical``: caller guarantees src < dst, one row per
    unordered pair, no self-loops (the ``derive_edges`` contract) — the
    defensive ``canonicalize_edges`` shuffle is skipped. A contract,
    not a hint: duplicate orientations would double-count wedges.
    Weights are ignored (NetworkX semantics for all three measures).
    """
    if assume_canonical:
        canon = edges.select("src", "dst")
    else:
        canon = canonicalize_edges(edges).select("src", "dst")
    # canon is consumed twice (wedge generation + the anti-join); the
    # result is returned LAZY, so no persist here — a cached plan with
    # no release point is a leak (the round-2 quarantine_sink lesson).
    # Callers looping over many scoring runs should persist their
    # canonical table themselves and pass assume_canonical=True.

    # (center, nbr) adjacency with the center's degree riding along —
    # degree computed by the same symmetrized stream, one shuffle.
    adj = symmetrize(canon, weight=False).select(
        F.col("src").alias("center"), F.col("dst").alias("nbr")
    )
    deg = adj.groupBy("center").agg(F.count(F.lit(1)).alias("_d"))
    if max_center_degree is not None:
        deg = deg.filter(F.col("_d") <= max_center_degree)
    cd = adj.join(deg, "center")  # inner join applies the cap

    left = cd.select("center", F.col("nbr").alias("a"), "_d")
    right = cd.select("center", F.col("nbr").alias("b"))
    wedges = left.join(right, "center").filter(F.col("a") < F.col("b"))

    scores = (
        wedges.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(1.0 / F.log(F.col("_d"))).alias("adamic_adar"),
            F.sum(1.0 / F.col("_d")).alias("resource_alloc"),
        )
        .filter(F.col("common_neighbors") >= min_common)
    )
    out = scores.join(
        canon,
        (scores.a == canon.src) & (scores.b == canon.dst),
        "left_anti",
    )
    return out
