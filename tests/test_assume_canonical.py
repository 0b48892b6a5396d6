"""assume_canonical fast path: results identical, one less shuffle.

``derive_edges`` output is canonical by contract (src < dst, one row
per unordered pair, no self-loops), so pagerank / cc / lpa / triangles
may skip their defensive re-canonicalization. These tests pin that the
skip is result-invariant on a real derived edge table, and that the
defensive plan actually contains the extra exchange the flag removes.
"""

from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark import datagen
from cryptowalletcommunitydetection_spark.graph import derive_edges
from cryptowalletcommunitydetection_spark.graph.cc import connected_components
from cryptowalletcommunitydetection_spark.graph.lpa import label_propagation
from cryptowalletcommunitydetection_spark.graph.pagerank import pagerank
from cryptowalletcommunitydetection_spark.graph.triangles import (
    triangle_count,
    triangles_per_vertex,
)


def _edges(spark):
    pdf = datagen.gen_files_pdf(n_repos=8, files_per_repo=6, n_entities=30)
    files = spark.createDataFrame(pdf, schema=datagen.FILES_SCHEMA)
    # pin: the derivation is consumed twice per test (flagged + default)
    return derive_edges(files).persist()


def test_derive_edges_output_is_canonical(spark):
    e = _edges(spark)
    try:
        bad = e.filter(
            (F.col("src") >= F.col("dst")) | F.col("src").isNull()
        ).count()
        assert bad == 0
        assert e.count() == e.select("src", "dst").distinct().count()
    finally:
        e.unpersist()


def test_pagerank_assume_canonical_parity(spark):
    e = _edges(spark)
    try:
        base = {
            r["id"]: r["rank"]
            for r in pagerank(spark, e, tol=1e-8).ranks.collect()
        }
        fast = {
            r["id"]: r["rank"]
            for r in pagerank(
                spark, e, tol=1e-8, assume_canonical=True
            ).ranks.collect()
        }
        assert base.keys() == fast.keys()
        for k in base:
            assert abs(base[k] - fast[k]) < 1e-12
    finally:
        e.unpersist()


def test_cc_lpa_triangles_assume_canonical_parity(spark):
    e = _edges(spark)
    try:
        cc_b = {r["id"]: r["component"] for r in connected_components(spark, e).collect()}
        cc_f = {
            r["id"]: r["component"]
            for r in connected_components(spark, e, assume_canonical=True).collect()
        }
        assert cc_b == cc_f

        lpa_b = {r["id"]: r["label"] for r in label_propagation(spark, e, max_iter=6).labels.collect()}
        lpa_f = {
            r["id"]: r["label"]
            for r in label_propagation(
                spark, e, max_iter=6, assume_canonical=True
            ).labels.collect()
        }
        assert lpa_b == lpa_f

        assert triangle_count(e) == triangle_count(e, assume_canonical=True)
        t_b = {r["id"]: r["triangles"] for r in triangles_per_vertex(e).collect()}
        t_f = {
            r["id"]: r["triangles"]
            for r in triangles_per_vertex(e, assume_canonical=True).collect()
        }
        assert t_b == t_f
    finally:
        e.unpersist()


def test_flag_misuse_would_double_count(spark):
    """The flag is a contract: a duplicate row under it changes the
    answer (documents WHY the defensive path exists). PageRank is
    duplicate-invariant (per-src normalization treats multiplicity as
    summed weight), but triangle counting is not — each duplicate
    oriented edge re-emits every wedge through it."""
    # triangle a-b-c with a duplicated (a,b) leg; pendant edges pump c's
    # degree so the degree orientation makes a the wedge apex with
    # out-neighbors [b, b, c] — the duplicated leg emits the a-b-c wedge
    # twice on any strategy
    rows = [
        ("a", "b"), ("a", "b"), ("b", "c"), ("a", "c"),
        ("c", "d"), ("c", "e"),
    ]
    e = spark.createDataFrame(rows, "src string, dst string")
    assert triangle_count(e) == 1
    # under the violated contract the answer is wrong on BOTH physical
    # strategies (undefined behavior; they may inflate differently)
    assert triangle_count(e, assume_canonical=True, local=True) != 1
    assert triangle_count(e, assume_canonical=True, local=False) != 1
