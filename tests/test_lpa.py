"""LPA vs the deterministic pure-Python oracle (SURVEY.md §5 item 2)."""

import pytest

from cryptowalletcommunitydetection_spark import datagen
from cryptowalletcommunitydetection_spark.graph import label_propagation
from tests.oracles import sync_min_lpa

SHAPES = {
    "two_cliques": datagen.two_cliques_bridge(6),
    "star": datagen.star(10),
    "erdos_renyi": datagen.erdos_renyi(30, 0.08, seed=11),
    "disconnected": datagen.two_cliques_bridge(4) + [(50, 51), (51, 52)],
}


@pytest.mark.parametrize("name", sorted(SHAPES))
def test_lpa_matches_oracle(spark, name):
    pairs = SHAPES[name]
    edges = datagen.edges_df(spark, pairs)
    res = label_propagation(spark, edges, max_iter=20)
    got = {r["id"]: r["label"] for r in res.labels.collect()}
    assert got == sync_min_lpa(pairs, max_iter=20)
