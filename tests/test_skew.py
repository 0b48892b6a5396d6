"""Skew-handling invariance (SURVEY.md §5 item 5): salting must not
change results; hub graphs produce identical outputs with salting on/off."""

from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark import datagen
from cryptowalletcommunitydetection_spark.graph import pagerank
from cryptowalletcommunitydetection_spark.graph.skew import (
    degree_histogram,
    hub_vertices,
    salted_collect,
    salted_join,
)
from tests.oracles import nx_pagerank


def test_degree_histogram_and_hubs(spark):
    edges = datagen.edges_df(spark, datagen.star(1001))
    hist = {r["bucket"]: r for r in degree_histogram(edges).collect()}
    assert hist[3]["max_degree"] == 1000 and hist[3]["n_vertices"] == 1
    assert hist[0]["n_vertices"] == 1000
    hubs = hub_vertices(edges, threshold=100).collect()
    assert len(hubs) == 1 and hubs[0]["id"] == 0


def test_salted_join_equals_plain_join(spark):
    big = datagen.edges_df(spark, datagen.star(500))
    small = spark.createDataFrame([(0, "hub"), (3, "leaf")], "src long, tag string")
    plain = set(
        (r["src"], r["dst"], r["tag"]) for r in big.join(small, "src").collect()
    )
    salted = set(
        (r["src"], r["dst"], r["tag"])
        for r in salted_join(big, small, "src", nsalt=8, salt_from="dst").collect()
    )
    assert salted == plain


def test_salted_collect_equals_plain(spark):
    df = datagen.edges_df(spark, datagen.star(200) + datagen.ring(10))
    plain = {
        r["src"]: sorted(r["v"])
        for r in df.groupBy("src").agg(F.collect_list("dst").alias("v")).collect()
    }
    salted = {
        r["src"]: list(r["values"])
        for r in salted_collect(df, "src", "dst", nsalt=4).collect()
    }
    assert salted == plain
    salted_d = {
        r["src"]: list(r["values"])
        for r in salted_collect(df, "src", "dst", nsalt=4, distinct=True).collect()
    }
    plain_d = {k: sorted(set(v)) for k, v in plain.items()}
    assert salted_d == plain_d


def test_pagerank_on_hub_graph(spark):
    """Hub graph (star) — correctness is invariant to physical skew plan."""
    pairs = datagen.star(300) + datagen.ring(30)
    edges = datagen.edges_df(spark, pairs)
    res = pagerank(spark, edges, tol=1e-8)
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    oracle = nx_pagerank(pairs)
    assert max(abs(got[k] - oracle[k]) for k in oracle) < 1e-6
