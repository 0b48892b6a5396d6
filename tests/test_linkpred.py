"""Link prediction vs the NetworkX oracles (SURVEY.md §2.9 extension).

``nx.adamic_adar_index`` / ``nx.resource_allocation_index`` /
``nx.common_neighbors`` over non-adjacent pairs are the semantics
contract. The default-on ``max_center_degree`` cap is invariance-tested
(no-op below the cap) and behavior-tested (hub centers excluded from
wedge generation above it).
"""

import math

import networkx as nx
import pytest

from cryptowalletcommunitydetection_spark import datagen
from cryptowalletcommunitydetection_spark.graph.linkpred import (
    link_prediction_scores,
)

SHAPES = {
    "ring": datagen.ring(12),
    "star": datagen.star(8),
    "two_cliques": datagen.two_cliques_bridge(5),
    "erdos_renyi": datagen.erdos_renyi(40, 0.12, seed=7),
}


def _nx_scores(pairs):
    g = nx.Graph()
    g.add_edges_from(pairs)
    non_adj = [
        (a, b)
        for a in g
        for b in g
        if a < b and not g.has_edge(a, b)
    ]
    out = {}
    for a, b in non_adj:
        common = list(nx.common_neighbors(g, a, b))
        if not common:
            continue
        out[(a, b)] = (
            len(common),
            sum(1.0 / math.log(g.degree(v)) for v in common),
            sum(1.0 / g.degree(v) for v in common),
        )
    return out


@pytest.mark.parametrize("name", sorted(SHAPES))
def test_scores_match_networkx(spark, name):
    pairs = SHAPES[name]
    edges = datagen.edges_df(spark, pairs)
    got = {
        (r["a"], r["b"]): (
            r["common_neighbors"],
            r["adamic_adar"],
            r["resource_alloc"],
        )
        for r in link_prediction_scores(edges).collect()
    }
    want = _nx_scores(pairs)
    assert set(got) == set(want)
    for k, (cn, aa, ra) in want.items():
        assert got[k][0] == cn
        assert got[k][1] == pytest.approx(aa, abs=1e-12)
        assert got[k][2] == pytest.approx(ra, abs=1e-12)


def test_cap_is_noop_below_threshold(spark):
    pairs = datagen.erdos_renyi(40, 0.15, seed=11)
    edges = datagen.edges_df(spark, pairs)
    capped = sorted(
        map(tuple, link_prediction_scores(edges, max_center_degree=10_000).collect())
    )
    exact = sorted(
        map(tuple, link_prediction_scores(edges, max_center_degree=None).collect())
    )
    assert capped == exact


def test_cap_excludes_hub_centers(spark):
    # star: the hub is the only common neighbor of any leaf pair
    pairs = datagen.star(9)
    edges = datagen.edges_df(spark, pairs)
    assert link_prediction_scores(edges, max_center_degree=None).count() > 0
    # hub degree 9 > cap 5 -> no wedge centers survive
    assert link_prediction_scores(edges, max_center_degree=5).count() == 0


def test_adjacent_pairs_never_scored(spark):
    pairs = datagen.two_cliques_bridge(5)
    edges = datagen.edges_df(spark, pairs)
    got = {
        (r["a"], r["b"]) for r in link_prediction_scores(edges).collect()
    }
    canon = {(min(a, b), max(a, b)) for a, b in pairs}
    assert not (got & canon)


def test_noncanonical_input_collapses(spark):
    pairs = datagen.two_cliques_bridge(4)
    dup = pairs + [(b, a) for a, b in pairs]  # reversed duplicates
    clean = link_prediction_scores(datagen.edges_df(spark, pairs)).collect()
    dirty = link_prediction_scores(datagen.edges_df(spark, dup)).collect()
    key = lambda r: (r["a"], r["b"])  # noqa: E731
    assert sorted(map(tuple, clean), key=None) == sorted(map(tuple, dirty), key=None)
