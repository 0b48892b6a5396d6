"""Relational operator surface vs pandas re-computation (SURVEY.md §2.2-2.6)."""

from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark.operators import (
    anti_join,
    distinct_senders,
    group_set_union,
    merge_upsert,
    native_transfer_filter,
    recency_filter,
    semi_join,
    top1_per_key,
    tumbling_slices,
)


def _transfers(spark):
    return spark.createDataFrame(
        [
            (100, "0xaaa", "0xhot1", "5"),
            (150, "0xbbb", "0xhot1", "0"),
            (200, "0xccc", "0xcold", "7"),
            (250, "0xhot2", "0xhot1", "3"),
            (300, "0xaaa", "0xhot2", "2"),
        ],
        "block_number long, from_address string, to_address string, value string",
    )


def test_semi_anti_join(spark):
    df = _transfers(spark)
    hot = spark.createDataFrame([("0xhot1",), ("0xhot2",)], "to_address string")
    semi = {r["from_address"] for r in semi_join(df, hot, "to_address").collect()}
    assert semi == {"0xaaa", "0xbbb", "0xhot2"}
    hot_senders = hot.withColumnRenamed("to_address", "from_address")
    anti = {
        r["from_address"]
        for r in anti_join(semi_join(df, hot, "to_address"), hot_senders, "from_address").collect()
    }
    assert anti == {"0xaaa", "0xbbb"}  # the reference's deposit-wallet filter


def test_distinct_senders(spark):
    df = _transfers(spark)
    hot = spark.createDataFrame([("0xhot1",)], "w string")
    got = {r["from_address"] for r in distinct_senders(df, hot, 100, 250).collect()}
    assert got == {"0xaaa", "0xbbb", "0xhot2"}


def test_native_transfer_filter(spark):
    df = spark.createDataFrame(
        [
            ("0x", "5", 1),      # keep
            ("0x", "0", 1),      # zero value
            ("0xdead", "5", 1),  # contract call
            ("0x", "5", 0),      # failed receipt
        ],
        "input string, value string, receipt_status int",
    )
    assert native_transfer_filter(df).count() == 1


def test_recency_filter(spark):
    df = spark.createDataFrame(
        [("p1", 100), ("p1", 900), ("p2", 100)], "pool string, ts long"
    )
    got = {r["pool"] for r in recency_filter(df, "pool", "ts", cutoff=500).collect()}
    assert got == {"p1"}


def test_top1_per_key(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 5, "y"), ("b", 2, "z")], "k string, v long, tag string"
    )
    got = {r["k"]: r["tag"] for r in top1_per_key(df, "k", "v").collect()}
    assert got == {"a": "y", "b": "z"}


def test_group_set_union(spark):
    df = spark.createDataFrame(
        [
            ("0xa", "lending", "pool1", "bsc"),
            ("0xa", "lending", "pool1", "bsc"),  # dup collapses ($addToSet)
            ("0xa", "dex", "pool2", "eth"),
        ],
        "address string, tag string, protocol string, chain string",
    )
    row = group_set_union(df, "address", "tag", ["protocol", "chain"]).collect()[0]
    assert sorted(row["tags"]) == ["dex", "lending"]
    assert len(row["protocols"]) == 2


def test_tumbling_slices(spark):
    df = spark.createDataFrame([(3601,), (7199,), (7200,)], "ts long")
    got = sorted(r["slice_start"] for r in tumbling_slices(df, "ts", 3600).collect())
    assert got == [3600, 3600, 7200]


def test_merge_upsert_set_union(spark):
    existing = spark.createDataFrame(
        [("0xa", 100, ["cex"]), ("0xb", 100, ["dex"])],
        "address string, lastUpdatedAt long, tags array<string>",
    )
    updates = spark.createDataFrame(
        [("0xa", 200, ["lending"]), ("0xc", 200, ["cex"])],
        "address string, lastUpdatedAt long, tags array<string>",
    )
    got = {
        r["address"]: (r["lastUpdatedAt"], list(r["tags"]))
        for r in merge_upsert(
            existing, updates, ["address"], set_union_cols=["tags"]
        ).collect()
    }
    assert got == {
        "0xa": (200, ["cex", "lending"]),  # matched: $set ts, $addToSet tags
        "0xb": (100, ["dex"]),             # untouched
        "0xc": (200, ["cex"]),             # inserted
    }


def test_merge_upsert_table_catalog_path(spark):
    """Catalog-native upsert: MERGE INTO when the catalog supports
    row-level ops, DataFrame fallback otherwise (this container's
    parquet catalog exercises the fallback) — final table contents must
    equal merge_upsert's."""
    from cryptowalletcommunitydetection_spark.operators.relational import (
        merge_upsert_table,
    )

    spark.sql("DROP TABLE IF EXISTS mu_target_test")
    existing = spark.createDataFrame(
        [("0xa", 100, ["cex"]), ("0xb", 100, ["dex"])],
        "address string, lastUpdatedAt long, tags array<string>",
    )
    updates = spark.createDataFrame(
        [("0xa", 200, ["lending"]), ("0xc", 200, ["cex"])],
        "address string, lastUpdatedAt long, tags array<string>",
    )
    existing.write.saveAsTable("mu_target_test")
    try:
        merge_upsert_table(
            spark, "mu_target_test", updates, ["address"], set_union_cols=["tags"]
        )
        got = {
            r["address"]: (r["lastUpdatedAt"], list(r["tags"]))
            for r in spark.table("mu_target_test").collect()
        }
        assert got == {
            "0xa": (200, ["cex", "lending"]),
            "0xb": (100, ["dex"]),
            "0xc": (200, ["cex"]),
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS mu_target_test")
