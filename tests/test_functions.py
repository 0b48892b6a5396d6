"""Scalar + time-series function surface (SURVEY.md §2.7, §2.4 A8, §2.5)."""

from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark.functions import (
    asof_last_value,
    carry_forward_sum,
    composite_key,
    deterministic_id,
    keep_one_per_bucket,
    normalize_address,
    parse_datestr_unix,
    parse_human_amount,
    parse_percentage,
    snake_to_camel,
    split_composite_key,
    token_value_usd,
)


def test_scalar_functions(spark):
    df = spark.createDataFrame(
        [("0xABCdef", "bsc", "$1.2m", "12.5%", "Jan-02-2021 03:04:05 PM")],
        "addr string, chain string, amount string, pct string, dt string",
    )
    row = df.select(
        normalize_address("addr").alias("a"),
        composite_key("chain", "addr").alias("k"),
        parse_human_amount("amount").alias("amt"),
        parse_percentage("pct").alias("p"),
        parse_datestr_unix("dt").alias("ts"),
        deterministic_id("chain", "addr").alias("gid"),
    ).collect()[0]
    assert row["a"] == "0xabcdef"
    assert row["k"] == "bsc_0xABCdef"
    assert row["amt"] == 1_200_000.0
    assert row["p"] == 0.125
    assert row["ts"] == 1609599845  # 2021-01-02 15:04:05 UTC
    assert len(row["gid"]) == 64
    # deterministic across evaluations
    again = df.select(deterministic_id("chain", "addr").alias("gid")).collect()[0]
    assert again["gid"] == row["gid"]


def test_parse_human_amount_suffixes(spark):
    df = spark.createDataFrame(
        [("$5k",), ("3.5b",), ("1,234.5",), ("42",)], "s string"
    )
    got = [r[0] for r in df.select(parse_human_amount("s")).collect()]
    assert got == [5_000.0, 3_500_000_000.0, 1234.5, 42.0]


def test_split_composite_key(spark):
    df = spark.createDataFrame([("bsc_0xabc",)], "ca string")
    c0, c1 = split_composite_key("ca")
    row = df.select(c0.alias("chain"), c1.alias("addr")).collect()[0]
    assert (row["chain"], row["addr"]) == ("bsc", "0xabc")


def test_snake_to_camel():
    assert snake_to_camel("lending_pool_id") == "lendingPoolId"
    assert snake_to_camel("address") == "address"


def test_token_value_usd(spark):
    df = spark.createDataFrame([(1500000000000000000, 18, 2.5)], "r long, d int, p double")
    got = df.select(token_value_usd("r", "d", "p").alias("v")).collect()[0]["v"]
    assert abs(got - 3.75) < 1e-9


def test_asof_last_value(spark):
    df = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 20, 2.0), ("a", 30, 3.0), ("b", 15, 9.0)],
        "key string, ts long, value double",
    )
    got = {r["key"]: (r["ts"], r["value"]) for r in asof_last_value(df, at=25).collect()}
    assert got == {"a": (20, 2.0), "b": (15, 9.0)}
    latest = {r["key"]: r["value"] for r in asof_last_value(df).collect()}
    assert latest == {"a": 3.0, "b": 9.0}


def test_keep_one_per_bucket(spark):
    df = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 150, 2.0), ("a", 400, 3.0)],
        "key string, ts long, value double",
    )
    got = sorted(
        (r["ts"], r["value"])
        for r in keep_one_per_bucket(df, interval=300, keep="last").collect()
    )
    assert got == [(150, 2.0), (400, 3.0)]


def test_carry_forward_sum(spark):
    # reference combined_logs semantics (utils/list_dict_utils.py:98-120):
    # union timestamps, carry each series forward, sum across series
    df = spark.createDataFrame(
        [("s1", 10, 1.0), ("s1", 30, 5.0), ("s2", 20, 10.0)],
        "key string, ts long, value double",
    )
    got = [(r["ts"], r["combined"]) for r in carry_forward_sum(df).collect()]
    assert got == [(10, 1.0), (20, 11.0), (30, 15.0)]


def test_asof_join_backward_and_forward(spark):
    from cryptowalletcommunitydetection_spark.functions.timeseries import asof_join

    left = spark.createDataFrame(
        [("u1", 5, "e1"), ("u1", 15, "e2"), ("u1", 25, "e3"), ("u2", 10, "e4")],
        "user string, ts long, eid string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 1.0), ("u1", 20, 2.0), ("u2", 30, 9.0)],
        "user string, ts long, px double",
    )
    back = {
        r["eid"]: r["px"]
        for r in asof_join(left, right, on="ts", by="user").collect()
    }
    # e1: no px at/before ts=5; e2: px@10; e3: px@20; u2 e4: none before 10
    assert back == {"e1": None, "e2": 1.0, "e3": 2.0, "e4": None}
    fwd = {
        r["eid"]: r["px"]
        for r in asof_join(left, right, on="ts", by="user", direction="forward").collect()
    }
    assert fwd == {"e1": 1.0, "e2": 2.0, "e3": None, "e4": 9.0}


def test_asof_join_tie_includes_equal_ts(spark):
    from cryptowalletcommunitydetection_spark.functions.timeseries import asof_join

    left = spark.createDataFrame([("u", 10, "e")], "user string, ts long, eid string")
    right = spark.createDataFrame([("u", 10, 7.0)], "user string, ts long, px double")
    got = asof_join(left, right, on="ts", by="user").collect()
    assert got[0]["px"] == 7.0
