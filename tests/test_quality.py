"""Modularity vs the NetworkX oracle (SURVEY.md §2.9 extension).

``nx.community.modularity`` is the semantics contract, weighted and
unweighted, over LPA-produced partitions and arbitrary ones.
"""

import networkx as nx
import pytest

from cryptowalletcommunitydetection_spark import datagen
from cryptowalletcommunitydetection_spark.graph.lpa import label_propagation
from cryptowalletcommunitydetection_spark.graph.quality import (
    modularity, modularity_by_community,
)


def _nx_modularity(pairs, assign, weights=None):
    g = nx.Graph()
    if weights is None:
        g.add_edges_from(pairs)
    else:
        g.add_weighted_edges_from(
            [(a, b, w) for (a, b), w in zip(pairs, weights)]
        )
    comms = {}
    for v, c in assign.items():
        comms.setdefault(c, set()).add(v)
    return nx.community.modularity(
        g, comms.values(), weight="weight" if weights else None
    )


def test_matches_networkx_unweighted(spark):
    pairs = datagen.two_cliques_bridge(6)
    edges = datagen.edges_df(spark, pairs)
    # ground-truth split: one community per clique
    assign = {v: v // 6 for v in range(12)}
    labels = spark.createDataFrame(list(assign.items()), ["id", "label"])
    q = modularity(edges, labels, weighted=False)
    assert q == pytest.approx(_nx_modularity(pairs, assign), abs=1e-12)


def test_matches_networkx_weighted(spark):
    pairs = datagen.erdos_renyi(30, 0.15, seed=5)
    weights = [1.0 + (i % 7) for i in range(len(pairs))]
    rows = [(a, b, w) for (a, b), w in zip(pairs, weights)]
    edges = spark.createDataFrame(rows, ["src", "dst", "weight"])
    verts = sorted({v for p in pairs for v in p})
    assign = {v: v % 3 for v in verts}
    labels = spark.createDataFrame(list(assign.items()), ["id", "label"])
    q = modularity(edges, labels, weighted=True)
    assert q == pytest.approx(_nx_modularity(pairs, assign, weights), abs=1e-12)


def test_lpa_partition_scores_higher_than_random(spark):
    pairs = datagen.two_cliques_bridge(8)
    edges = datagen.edges_df(spark, pairs)
    res = label_propagation(spark, edges, max_iter=4)
    q_lpa = modularity(edges, res.labels, weighted=False)
    verts = sorted({v for p in pairs for v in p})
    scrambled = spark.createDataFrame(
        [(v, v % 2) for v in verts], ["id", "label"]
    )
    q_rand = modularity(edges, scrambled, weighted=False)
    assert q_lpa > q_rand
    # per-community rows reassemble the scalar
    per = modularity_by_community(edges, res.labels, weighted=False)
    assert sum(r["q_contrib"] for r in per.collect()) == pytest.approx(
        q_lpa, abs=1e-12
    )


def test_single_community_q_zero(spark):
    pairs = datagen.ring(10)
    edges = datagen.edges_df(spark, pairs)
    labels = spark.createDataFrame([(v, 0) for v in range(10)], ["id", "label"])
    # all mass internal: Q = 1 - 1 = 0 exactly
    assert modularity(edges, labels, weighted=False) == pytest.approx(0.0, abs=1e-12)


def test_duplicate_orientations_collapse(spark):
    pairs = datagen.two_cliques_bridge(5)
    dup = pairs + [(b, a) for a, b in pairs]
    labels_rows = [(v, v // 5) for v in range(10)]
    labels = spark.createDataFrame(labels_rows, ["id", "label"])
    q_clean = modularity(datagen.edges_df(spark, pairs), labels, weighted=False)
    q_dup = modularity(datagen.edges_df(spark, dup), labels, weighted=False)
    assert q_clean == pytest.approx(q_dup, abs=1e-12)
