"""Random-walk corpus properties (SURVEY.md §2.10 training-data
extension).

No closed-form oracle exists for hash-driven walks, so the contract is
property-based: structural validity (every consecutive pair is an
edge), exact shape (W walks of length L per start vertex), determinism
(same seed → identical corpus across recomputation and partitioning),
seed sensitivity, and statistical neighbor coverage (a hub's walks must
not collapse onto few neighbors — the rank-hash must spread).
"""

import networkx as nx
import pytest

from cryptowalletcommunitydetection_spark import datagen
from cryptowalletcommunitydetection_spark.graph.walks import (
    random_walks,
    ranked_adjacency,
)

PAIRS = datagen.two_cliques_bridge(5) + [(20, 21), (21, 22), (22, 20)]


def _corpus(spark, pairs, **kw):
    edges = datagen.edges_df(spark, pairs)
    return {
        r["walk_id"]: (r["start"], tuple(r["seq"]))
        for r in random_walks(edges, **kw).collect()
    }


def test_shape_and_starts(spark):
    got = _corpus(spark, PAIRS, num_walks=3, walk_length=7, seed=1)
    g = nx.Graph()
    g.add_edges_from(PAIRS)
    assert len(got) == 3 * g.number_of_nodes()
    for wid, (start, seq) in got.items():
        assert len(seq) == 7
        assert seq[0] == start
        assert wid == f"{start}#{int(wid.split('#')[1])}"
    # every vertex starts exactly num_walks walks
    starts = [start for start, _ in got.values()]
    assert {s: starts.count(s) for s in set(starts)} == {
        v: 3 for v in g.nodes()
    }


def test_every_step_is_an_edge(spark):
    got = _corpus(spark, PAIRS, num_walks=4, walk_length=10, seed=9)
    edge_set = {tuple(sorted(p)) for p in PAIRS}
    for _, seq in got.values():
        for u, v in zip(seq, seq[1:]):
            assert tuple(sorted((u, v))) in edge_set


def test_deterministic_across_runs_and_partitioning(spark):
    a = _corpus(spark, PAIRS, num_walks=2, walk_length=6, seed=5)
    b = _corpus(spark, PAIRS, num_walks=2, walk_length=6, seed=5)
    assert a == b
    # different input partitioning, same corpus
    edges = datagen.edges_df(spark, PAIRS).repartition(7)
    c = {
        r["walk_id"]: (r["start"], tuple(r["seq"]))
        for r in random_walks(edges, num_walks=2, walk_length=6, seed=5).collect()
    }
    assert a == c


def test_seed_changes_corpus(spark):
    a = _corpus(spark, PAIRS, num_walks=2, walk_length=8, seed=1)
    b = _corpus(spark, PAIRS, num_walks=2, walk_length=8, seed=2)
    assert a != b


def test_hub_neighbor_coverage(spark):
    """200 walks stepping off a star hub must spread over its 12 spokes
    (hash-rank spreading, not a constant choice)."""
    pairs = datagen.star(13)
    edges = datagen.edges_df(spark, pairs)
    hub_starts = edges.sparkSession.createDataFrame([(0,)], ["id"])
    corpus = random_walks(
        edges, num_walks=200, walk_length=2, seed=3, starts=hub_starts
    ).collect()
    first_hops = {tuple(r["seq"])[1] for r in corpus}
    assert len(first_hops) >= 9  # 12 spokes; hash spread, not uniform law


def test_restricted_starts(spark):
    edges = datagen.edges_df(spark, PAIRS)
    starts = edges.sparkSession.createDataFrame([(0,), (1,)], ["id"])
    got = random_walks(
        edges, num_walks=2, walk_length=4, seed=7, starts=starts
    ).collect()
    assert len(got) == 4
    assert {r["start"] for r in got} == {0, 1}


def test_ranked_adjacency_contract(spark):
    edges = datagen.edges_df(spark, PAIRS)
    adj = ranked_adjacency(edges).collect()
    g = nx.Graph()
    g.add_edges_from(PAIRS)
    # one row per directed orientation, ranks dense per source
    assert len(adj) == 2 * g.number_of_edges()
    by_src = {}
    for r in adj:
        by_src.setdefault(r["src"], []).append((r["rank"], r["dst"]))
    for src, rows in by_src.items():
        ranks = sorted(rank for rank, _ in rows)
        assert ranks == list(range(g.degree(src)))
        # rank order follows dst order (deterministic)
        assert sorted(rows) == sorted(
            (i, d) for i, d in enumerate(sorted(g[src]))
        )


def test_validation(spark):
    edges = datagen.edges_df(spark, PAIRS)
    with pytest.raises(ValueError):
        random_walks(edges, walk_length=0)
    with pytest.raises(ValueError):
        random_walks(edges, num_walks=0)
