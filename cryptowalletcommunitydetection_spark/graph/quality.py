"""Community-quality metrics over a (edges, labels) pair.

North-rule extension (SURVEY.md §2.9): the reference assigns wallets to
communities (services/wallet_clustering.py, jobs/*_lpa_job.py) but never
scores the partition; modularity is the standard figure of merit for
exactly that output — how much intra-community weight exceeds the
degree-preserving random expectation (Newman 2006):

    Q = Σ_c [ L_c/m − (D_c/(2m))² ]

with m the total edge weight, L_c the intra-community edge weight and
D_c the summed weighted degree of community c's members. Matches
``networkx.algorithms.community.modularity`` (tested).

Scale design: two |E|-row label-attach joins (the |V|-row label table
broadcasts while it fits, AQE converts it automatically) feeding
map-side-combinable groupBys on the label key — one pass over the edge
table, scalars only at the driver. No iteration, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import canonicalize_edges


def modularity_by_community(
    edges: DataFrame,
    labels: DataFrame,
    weighted: bool = True,
    assume_canonical: bool = False,
) -> DataFrame:
    """DataFrame[label, internal_weight, degree_sum, q_contrib] — one
    row per community that touches at least one edge, where ``Q =
    sum(q_contrib)``. ``labels``: DataFrame[id, label] (LPA / CC / any
    assignment). Vertices missing a label are dropped with their
    incident edges (partial-assignment semantics); isolated vertices
    contribute 0 to every term and carry no row.

    ``assume_canonical``: caller guarantees src < dst, one row per
    unordered pair, no self-loops — skips the defensive
    ``canonicalize_edges`` shuffle (duplicate orientations would
    double-count both m and the degree sums).
    """
    has_w = weighted and "weight" in edges.columns
    if assume_canonical:
        canon = edges.select(
            "src", "dst",
            (F.col("weight") if has_w else F.lit(1)).cast("double").alias("w"),
        )
    else:
        canon = canonicalize_edges(
            edges, weight="weight" if has_w else None
        ).select(
            "src", "dst",
            (F.col("weight") if has_w else F.lit(1)).cast("double").alias("w"),
        )

    la = labels.select(F.col("id").alias("_ida"), F.col("label").alias("_la"))
    lb = labels.select(F.col("id").alias("_idb"), F.col("label").alias("_lb"))
    el = (
        canon.join(la, F.col("src") == F.col("_ida"))
        .join(lb, F.col("dst") == F.col("_idb"))
        .select("_la", "_lb", "w")
    )

    # one pass: every edge contributes w to both endpoint communities'
    # degree sums, and to internal weight when the endpoints agree
    sides = el.select(
        F.col("_la").alias("label"), F.col("_lb").alias("other"), "w"
    ).unionByName(
        el.select(F.col("_lb").alias("label"), F.col("_la").alias("other"), "w")
    )
    per = sides.groupBy("label").agg(
        F.sum("w").alias("degree_sum"),
        # each intra edge appears on both sides -> sum/2 restores L_c
        (
            F.sum(
                F.when(F.col("label") == F.col("other"), F.col("w")).otherwise(0.0)
            )
            / 2
        ).alias("internal_weight"),
    )
    # m = sum of degree sums / 2, from the SAME pass over the edge
    # table, as a global-window column over the |communities|-row table
    # (the single-partition exchange is over community rows, never edge
    # rows). This keeps the whole result one lazy JVM plan: no driver
    # action at build time, no pinned checkpoint (a previous version
    # leaked one eager localCheckpoint per call), and no pickle-backed
    # local relation taxing every downstream action (collect +
    # createDataFrame cost ~0.3 s per action on the Python runner).
    from pyspark.sql import Window

    m_col = F.sum("degree_sum").over(Window.partitionBy()) / 2.0
    return per.select(
        "label",
        "internal_weight",
        "degree_sum",
        # m == 0 (all surviving edges zero-weight) would divide by zero
        F.when(m_col == 0.0, F.lit(0.0))
        .otherwise(
            F.col("internal_weight") / m_col
            - F.pow(F.col("degree_sum") / (2.0 * m_col), 2)
        )
        .alias("q_contrib"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    weighted: bool = True,
    assume_canonical: bool = False,
) -> float:
    """Scalar Q of the partition (``nx.community.modularity`` twin)."""
    per = modularity_by_community(
        edges, labels, weighted=weighted, assume_canonical=assume_canonical
    )
    row = per.agg(F.sum("q_contrib").alias("q")).collect()[0]
    return float(row["q"] or 0.0)
