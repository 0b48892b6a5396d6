"""Physical-plan audits beyond the no-per-row-Python check: predicate
pushdown must reach the Parquet scan, column pruning must shrink the
read schema, small dimension joins must broadcast, and the persisted
PageRank transition table must not be re-shuffled inside a superstep.
These are the .explain() properties SURVEY.md §4 claims Catalyst gives
for free — asserted so a regression is caught, not assumed."""

import os

import pytest

from cryptowalletcommunitydetection_spark import entry_queries as EQ

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df):
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_scan(spark):
    plan = _formatted(EQ.q_filter_project_distinct(spark, SF_DIR))
    pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
    # both predicates pushed (range on o_orderdate, gt on o_totalprice)
    assert "GreaterThan(o_totalprice" in pushed
    assert "o_orderdate" in pushed


def test_column_pruning_in_read_schema(spark):
    plan = _formatted(EQ.q_filter_project_distinct(spark, SF_DIR))
    rs = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    # only the filter + projection columns are read, not the whole table
    assert "o_custkey" in rs
    assert "o_orderpriority" not in rs and "o_orderstatus" not in rs


def test_dimension_joins_broadcast(spark):
    plan = _plan(EQ.q_semi_join_agg(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    plan2 = _plan(EQ._trade_pairs(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan2 or "BroadcastExchange" in plan2


def test_pagerank_superstep_edge_side_not_reshuffled(spark):
    """The persisted transition table must enter the scatter join from
    InMemoryTableScan with no Exchange above it (partitioned once,
    reused every superstep)."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from cryptowalletcommunitydetection_spark.graph.edges import symmetrize
    from cryptowalletcommunitydetection_spark import datagen

    edges = datagen.edges_df(spark, datagen.ring(64))
    e = symmetrize(
        edges.select("src", "dst", F.lit(1).alias("weight")), weight=True
    )
    out_w = e.groupBy("src").agg(F.sum("weight").alias("_wsum"))
    ne = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("_wsum")).alias("p"))
        .repartition(8, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ne.count()
    ranks = e.select(F.col("src").alias("id")).distinct().select(
        "id", F.lit(1.0).alias("rank")
    ).localCheckpoint(eager=True)
    contrib = ne.join(F.broadcast(ranks), ne.src == ranks.id).groupBy("dst").agg(
        F.sum(F.col("rank") * F.col("p")).alias("_c")
    )
    plan = _plan(contrib)
    cached_scan = plan.split("InMemoryTableScan", 1)[0]
    # nothing between the aggregation and the cached edge scan may
    # re-exchange the edge side; the only Exchange in the plan is the
    # final gather-by-dst (and none sits directly above the cache scan)
    assert "InMemoryTableScan" in plan
    assert "Exchange" not in cached_scan.split("BroadcastHashJoin", 1)[-1]
    ne.unpersist()


def test_bucketed_edges_skip_shuffle(spark, tmp_path):
    """write_edges buckets+sorts by src; a subsequent groupBy(src) and a
    src-keyed self-join read the bucketed scan with NO Exchange on the
    edge side (SURVEY.md §4 physical-layout promise)."""
    from pyspark.sql import functions as F

    from cryptowalletcommunitydetection_spark.sources.files import (
        read_edges, write_edges,
    )

    edges = EQ._bipartite_edges(spark, SF_DIR)
    n_buckets = 8
    write_edges(edges, "edges_bucketed_test", path=str(tmp_path / "eb"),
                buckets=n_buckets)
    try:
        br = read_edges(spark, "edges_bucketed_test")
        assert br.count() == edges.count()
        # out-degree aggregation straight off the bucketed scan
        agg_plan = br.groupBy("src").agg(F.sum("weight").alias("w"))._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in agg_plan, agg_plan
        assert "Bucketed: true" in agg_plan, agg_plan
        # src-keyed join of two bucketed reads: no shuffle on either side
        # (broadcast disabled so the planner actually uses the buckets —
        # a broadcast join wouldn't exercise the layout)
        abj = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            l, r = read_edges(spark, "edges_bucketed_test"), read_edges(
                spark, "edges_bucketed_test")
            jplan = l.join(r.withColumnRenamed("dst", "dst2")
                            .withColumnRenamed("weight", "w2"), "src")._jdf \
                .queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abj)
        assert "Exchange" not in jplan, jplan
        assert "Bucketed: true" in jplan, jplan
    finally:
        spark.sql("DROP TABLE IF EXISTS edges_bucketed_test")


def test_minhash_narrow_no_filter_below_exchange(spark):
    """The narrow MinHash plan's empty-doc drop is a Generate, never a
    Filter: a Filter over the shingle expression would be pushed below
    the parallelism-right-sizing exchange and evaluate the whole
    tokenize+shingle tree a second time at the SCAN's split count
    (serial on a single-split file). Pin: in the optimized plan the
    tokenizer expression appears exactly once, and never inside a
    Filter condition."""
    from cryptowalletcommunitydetection_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(50)] + [(99, "x")],
        "doc_id long, text string",
    ).repartition(1)
    plan = minhash_signatures(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_extract_all") == 1, plan
    for line in plan.splitlines():
        if line.lstrip().startswith(("Filter", "+- Filter", ":- Filter")):
            assert "regexp_extract_all" not in line, line
    # and the drop semantics survive: the 1-token doc is gone
    assert minhash_signatures(docs).count() == 50


def test_capped_banded_pairs_single_signature_pass(spark):
    """The default (capped) LSH candidate plan consumes the signature
    projection exactly ONCE: the former small/big self-join formulation
    evaluated it 3x (exchange reuse does not survive AQE's broadcast
    conversion of a join side), tripling the dominant cost at scale."""
    from cryptowalletcommunitydetection_spark.operators.dedup import (
        minhash_lsh_candidates, minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon {i % 9}") for i in range(60)],
        "doc_id long, text string",
    )
    plan = (
        minhash_lsh_candidates(minhash_signatures(docs), max_bucket=1000)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("regexp_extract_all") == 1, plan


def test_simhash_near_dups_single_signature_pass(spark):
    """The default (capped) simhash near-dup plan consumes the simhash
    aggregation exactly once: the 64-bit signature rides through pair
    generation as a payload instead of being joined back per side (each
    join side would re-evaluate the tokenize + 64-vote groupBy)."""
    from cryptowalletcommunitydetection_spark.operators.dedup import (
        simhash, simhash_near_dups,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    plan = (
        simhash_near_dups(simhash(docs), max_bucket=1000)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("regexp_extract_all") == 1, plan


def test_cc_round_shares_large_star_materialization(spark):
    """One CC round must not recompile the large-star subtree per
    small-star consumer. _round_step pins the large-star output (and the
    mins table) as cached RDDs, so the compiled round contains ONLY
    ExistingRDD scans below the small-star operators — zero xxhash64/
    Range re-derivations of the input — and at most 3 hash exchanges
    (mins agg, join probe side, output distinct). Before the pinning,
    the same round compiled to 6+ exchanges with the 2|E|-row large-star
    shuffles instantiated three times (measured 101.7s -> 43s at 11M
    canonical edges, local[32])."""
    from pyspark.sql import functions as F

    from cryptowalletcommunitydetection_spark.graph.cc import _round_step

    prev = spark.range(500).select(
        F.xxhash64("id").alias("src"), F.xxhash64("id", F.lit(7)).alias("dst")
    )
    stepped, pins = _round_step(prev)
    try:
        plan = _plan(stepped)
        assert plan.count("Exchange hashpartitioning") <= 3, plan
        # every leaf below the round is a pinned RDD scan, not a
        # recompute of the upstream edge derivation
        assert "Range (" not in plan, plan
        assert plan.count("Scan ExistingRDD") >= 3, plan
    finally:
        for p in pins:
            p.unpersist()
