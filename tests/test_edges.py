"""Edge derivation from the files table + invariants (SURVEY.md §5 item 1)."""

import hashlib

from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark import datagen
from cryptowalletcommunitydetection_spark.graph import (
    canonicalize_edges,
    degrees,
    derive_edges,
    encode_vertices,
    extract_entities,
    with_content_sha256,
)
from tests.oracles import expected_cooccurrence


def test_content_sha256_invariant(spark):
    pdf = datagen.gen_files_pdf(n_repos=3, files_per_repo=4)
    files = spark.createDataFrame(pdf, schema=datagen.FILES_SCHEMA)
    got = {
        r["path"] + r["repo"] + r["commit"]: r["content_sha256"]
        for r in with_content_sha256(files).collect()
    }
    for _, r in pdf.iterrows():
        want = hashlib.sha256(r["content"].encode()).hexdigest()
        assert got[r["path"] + r["repo"] + r["commit"]] == want


def test_cooccurrence_edges_match_oracle(spark):
    pdf = datagen.gen_files_pdf(n_repos=6, files_per_repo=5, n_entities=25)
    files = spark.createDataFrame(pdf, schema=datagen.FILES_SCHEMA)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in derive_edges(files).collect()
    }
    assert got == expected_cooccurrence(pdf)


def test_max_entities_per_group_cut(spark):
    pdf = datagen.gen_files_pdf(
        n_repos=4, files_per_repo=6, n_entities=30, entities_per_file=5
    )
    files = spark.createDataFrame(pdf, schema=datagen.FILES_SCHEMA)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in derive_edges(files, max_entities_per_group=10).collect()
    }
    assert got == expected_cooccurrence(pdf, max_entities_per_group=10)


def test_extraction_is_arrow_not_per_row_python(spark):
    files = datagen.gen_files(spark, n_repos=2, files_per_repo=2)
    plan = extract_entities(files)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_jvm_extraction_engine_parity(spark):
    # the codegen regexp_extract_all engine must agree with the Arrow
    # mapInPandas engine row-for-row (Java vs Python regex semantics
    # coincide for the default pattern class), and its plan must contain
    # no Python operator at all
    pdf = datagen.gen_files_pdf(n_repos=5, files_per_repo=6, n_entities=40)
    files = spark.createDataFrame(pdf, schema=datagen.FILES_SCHEMA)
    arrow = {tuple(r) for r in extract_entities(files, engine="arrow").collect()}
    jvm = {tuple(r) for r in extract_entities(files, engine="jvm").collect()}
    assert jvm == arrow and len(jvm) > 0
    plan = (
        extract_entities(files, engine="jvm")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "MapInPandas" not in plan

    e_arrow = {
        (r["src"], r["dst"]): r["weight"] for r in derive_edges(files).collect()
    }
    e_jvm = {
        (r["src"], r["dst"]): r["weight"]
        for r in derive_edges(files, engine="jvm").collect()
    }
    assert e_jvm == e_arrow


def test_canonicalize(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 3), (2, 3)], "src long, dst long"
    )
    rows = {(r["src"], r["dst"]): r["weight"] for r in canonicalize_edges(edges).collect()}
    assert rows == {(1, 2): 2, (2, 3): 1}


def test_degrees(spark):
    edges = datagen.edges_df(spark, datagen.star(5))
    got = {r["id"]: r["degree"] for r in degrees(edges).collect()}
    assert got == {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}


def test_encode_vertices_no_collisions_and_joinable(spark):
    files = datagen.gen_files(spark, n_repos=4, files_per_repo=4)
    edges = derive_edges(files)
    enc, vdict = encode_vertices(edges)
    assert vdict.select("vid").distinct().count() == vdict.count()
    assert enc.count() == edges.count()
    back = (
        enc.join(vdict.withColumnRenamed("vid", "src"), "src")
        .select(F.col("key").alias("src_key"))
        .distinct()
        .count()
    )
    assert back == edges.select("src").distinct().count()


def test_distributed_files_generator_matches_oracle(spark):
    """gen_files_distributed (JVM string synthesis) + the real extraction
    pipeline == the pure-Python oracle recomputed from collected content."""
    from cryptowalletcommunitydetection_spark.datagen import gen_files_distributed
    from cryptowalletcommunitydetection_spark.graph.edges import derive_edges
    from tests.oracles import expected_cooccurrence

    files = gen_files_distributed(
        spark, n_files=300, n_repos=25, n_entities=200, entities_per_file=4
    )
    got = {
        (r["src"], r["dst"]): r["weight"] for r in derive_edges(files).collect()
    }
    want = expected_cooccurrence(files.toPandas())
    assert got == want and len(got) > 100
