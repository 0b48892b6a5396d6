"""Triangle counting vs nx.triangles (SURVEY.md §5 item 2)."""

import pytest

from cryptowalletcommunitydetection_spark import datagen
from cryptowalletcommunitydetection_spark.graph import (
    triangle_count,
    triangles_per_vertex,
)
from tests.oracles import nx_triangles

SHAPES = {
    "ring": datagen.ring(10),            # 0 triangles
    "two_cliques": datagen.two_cliques_bridge(5),
    "erdos_renyi": datagen.erdos_renyi(35, 0.12, seed=5),
    "star": datagen.star(12),            # 0 triangles
}


@pytest.mark.parametrize("local", [True, False], ids=["local", "distributed"])
@pytest.mark.parametrize("name", sorted(SHAPES))
def test_triangles_match_networkx(spark, name, local):
    pairs = SHAPES[name]
    oracle = nx_triangles(pairs)
    edges = datagen.edges_df(spark, pairs)
    got = {
        r["id"]: r["triangles"]
        for r in triangles_per_vertex(edges, local=local).collect()
    }
    assert got == oracle
    assert triangle_count(edges, local=local) == sum(oracle.values()) // 3


@pytest.mark.parametrize("name", sorted(SHAPES))
def test_clustering_coefficient_matches_networkx(spark, name):
    import networkx as nx

    from cryptowalletcommunitydetection_spark.graph.triangles import (
        clustering_coefficient,
    )

    pairs = SHAPES[name]
    g = nx.Graph()
    g.add_edges_from(pairs)
    want = nx.clustering(g)
    got = {
        r["id"]: r["coeff"]
        for r in clustering_coefficient(datagen.edges_df(spark, pairs)).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
