"""Map-reshape function family (SURVEY.md §2 X6, F11-F13).

Semantics mirror the reference's dict plumbing:
- add_prefix_to_key_of_dict / concat_chain_id (utils/utils.py:195-199,221-226)
- filter_none_keys (utils/list_dict_utils.py:7-16)
- to_change_logs int-cast keys (utils/list_dict_utils.py:29-30)
- aggregate_separated_logs shared-key add (utils/utils.py:122-130)
- Mongo $addToSet per nested map key (databases/mongodb.py:106-118)
"""

import pytest
from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark.functions import maps as M
from cryptowalletcommunitydetection_spark.operators.relational import merge_upsert


def _map_df(spark, rows, value_type="int"):
    return spark.createDataFrame(rows, f"id string, m map<string,{value_type}>")


def _one(df, col="out"):
    return df.select(F.col(col)).first()[0]


def test_prefix_map_keys(spark):
    df = _map_df(spark, [("a", {"x": 1, "y": 2})])
    out = _one(df.select(M.prefix_map_keys("m", "0x38").alias("out")))
    assert out == {"0x38_x": 1, "0x38_y": 2}


def test_map_null_filter(spark):
    df = _map_df(spark, [("a", {"x": 1, "y": None, "z": 3})])
    out = _one(df.select(M.map_null_filter("m").alias("out")))
    assert out == {"x": 1, "z": 3}


def test_cast_map_keys_long_roundtrip(spark):
    df = _map_df(spark, [("a", {"170001": 5, "170002": 6})])
    out = _one(df.select(M.cast_map_keys_long("m").alias("out")))
    assert out == {170001: 5, 170002: 6}
    back = _one(
        df.select(M.cast_map_keys_string(M.cast_map_keys_long("m")).alias("out"))
    )
    assert back == {"170001": 5, "170002": 6}


def test_cast_map_keys_long_collision_strict_raises(spark):
    # "1" and "01" collide after the cast — the default strict mode must
    # surface that (mapKeyDedupPolicy=EXCEPTION), not silently pick one
    df = _map_df(spark, [("a", {"1": 10, "01": 20})])
    with pytest.raises(Exception):
        df.select(M.cast_map_keys_long("m").alias("out")).collect()


def test_cast_map_keys_long_lenient(spark):
    # lenient: collided keys keep the LAST entry's value (dict-comp
    # semantics), non-numeric keys drop
    df = _map_df(spark, [("a", {"1": 10, "01": 20, "x": 99, "2": 7})])
    ents = _one(
        df.select(
            F.sort_array(
                F.map_entries(M.cast_map_keys_long("m", lenient=True))
            ).alias("out")
        )
    )
    got = {e["key"]: e["value"] for e in ents}
    assert set(got) == {1, 2}
    assert got[2] == 7
    # the surviving value for key 1 must be one of the collided values,
    # specifically the later entry of the map's entry order
    raw = _one(df.select(F.map_entries("m").alias("out")))
    later = [e["value"] for e in raw if e["key"] in ("1", "01")][-1]
    assert got[1] == later


def test_merge_maps_sum_shared_and_disjoint_and_null(spark):
    df = spark.createDataFrame(
        [
            ("a", {"x": 1, "y": 2}, {"y": 10, "z": 3}),
            ("b", None, {"w": 7}),
            ("c", {"v": 4}, None),
        ],
        "id string, l map<string,int>, r map<string,int>",
    )
    out = {
        r["id"]: r["out"]
        for r in df.select("id", M.merge_maps_sum("l", "r").alias("out")).collect()
    }
    assert out == {"a": {"x": 1, "y": 12, "z": 3}, "b": {"w": 7}, "c": {"v": 4}}


def test_merge_maps_array_union(spark):
    df = spark.createDataFrame(
        [("a", {"p1": ["u2", "u1"], "p2": ["u3"]}, {"p1": ["u1", "u4"], "p3": ["u5"]})],
        "id string, l map<string,array<string>>, r map<string,array<string>>",
    )
    out = _one(df.select(M.merge_maps_array_union("l", "r").alias("out")))
    assert out == {"p1": ["u1", "u2", "u4"], "p2": ["u3"], "p3": ["u5"]}


def test_last_write_map_merge(spark):
    df = spark.createDataFrame(
        [("a", {"x": 1, "y": 2}, {"y": 9, "z": 3})],
        "id string, l map<string,int>, r map<string,int>",
    )
    out = _one(df.select(M.last_write_map_merge("l", "r").alias("out")))
    assert out == {"x": 1, "y": 9, "z": 3}


def test_entries_to_map_and_explode_roundtrip(spark):
    rows = spark.createDataFrame(
        [("a", "k1", 1), ("a", "k2", 2), ("b", "k1", 3)],
        "id string, k string, v int",
    )
    mapped = M.entries_to_map(rows, ["id"], "k", "v", out_col="mm")
    got = {r["id"]: r["mm"] for r in mapped.collect()}
    assert got == {"a": {"k1": 1, "k2": 2}, "b": {"k1": 3}}
    back = M.explode_map(mapped, "mm", ["id"])
    assert sorted(tuple(r) for r in back.collect()) == [
        ("a", "k1", 1), ("a", "k2", 2), ("b", "k1", 3),
    ]


def test_entries_to_map_duplicate_keys_raise(spark):
    rows = spark.createDataFrame([("a", "k", 1), ("a", "k", 2)], "id string, k string, v int")
    with pytest.raises(Exception, match="(?i)duplicate"):
        M.entries_to_map(rows, ["id"], "k", "v").collect()


def test_sorted_map_entries(spark):
    df = spark.createDataFrame(
        [("a", {3: "c", 1: "a", 2: "b"})], "id string, m map<int,string>"
    )
    out = _one(df.select(M.sorted_map_entries("m").alias("out")))
    assert [tuple(e) for e in out] == [(1, "a"), (2, "b"), (3, "c")]
    rev = _one(df.select(M.sorted_map_entries("m", reverse=True).alias("out")))
    assert [tuple(e) for e in rev] == [(3, "c"), (2, "b"), (1, "a")]


def test_merge_upsert_map_union_cols(spark):
    """The $addToSet-over-map upsert: keys only in one side insert, matched
    keys union per-protocol arrays; last-write columns still $set."""
    existing = spark.createDataFrame(
        [("w1", 10, {"aave": ["p1"], "comp": ["p2"]}), ("w2", 20, {"aave": ["p9"]})],
        "addr string, bal int, protocols map<string,array<string>>",
    )
    updates = spark.createDataFrame(
        [("w1", 11, {"aave": ["p3", "p1"], "uni": ["p4"]}), ("w3", 30, {"uni": ["p5"]})],
        "addr string, bal int, protocols map<string,array<string>>",
    )
    out = {
        r["addr"]: (r["bal"], r["protocols"])
        for r in merge_upsert(
            existing, updates, ["addr"], map_union_cols=["protocols"]
        ).collect()
    }
    assert out == {
        "w1": (11, {"aave": ["p1", "p3"], "comp": ["p2"], "uni": ["p4"]}),
        "w2": (20, {"aave": ["p9"]}),
        "w3": (30, {"uni": ["p5"]}),
    }
