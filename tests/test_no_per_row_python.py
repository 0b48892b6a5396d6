"""Hot-path audit (SURVEY.md §5 item 6, BASELINE.md): physical plans must
contain no BatchEvalPython (row-at-a-time Python UDF) anywhere; the only
Python-executing node allowed is Arrow MapInPandas in the extraction
stage."""

from cryptowalletcommunitydetection_spark import datagen
from cryptowalletcommunitydetection_spark.graph import (
    canonicalize_edges,
    derive_edges,
    symmetrize,
    triangles_per_vertex,
)
from cryptowalletcommunitydetection_spark.graph.rollup import bipartite_group_rollup


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_edge_derivation_plan(spark):
    files = datagen.gen_files(spark, n_repos=2, files_per_repo=3)
    plan = _plan(derive_edges(files))
    assert "BatchEvalPython" not in plan


def test_graph_pipeline_plans_pure_jvm(spark):
    edges = datagen.edges_df(spark, datagen.two_cliques_bridge(4))
    for df in (
        canonicalize_edges(edges),
        symmetrize(canonicalize_edges(edges)),
        triangles_per_vertex(edges),
        bipartite_group_rollup(
            spark,
            edges.selectExpr(
                "cast(src as string) from_address", "cast(dst as string) to_address"
            ),
        ),
    ):
        plan = _plan(df)
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan  # no Python at all beyond extraction
