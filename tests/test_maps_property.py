"""Property tests (hypothesis) for the map-merge algebra.

The reference folds wallet dicts imperatively (utils/utils.py:122-143,
228-233; databases/mongodb.py:110-118); these properties pin the Spark
re-expressions to the same algebra: commutativity/associativity of the
sum-merge, idempotence of the set-union merge, and pure-Python oracle
agreement on arbitrary inputs. One Spark action per example keeps the
suite fast (max_examples trimmed; each example is a whole batch of rows).
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark.functions import maps as M

keys = st.text(alphabet="abcdef", min_size=1, max_size=4)
int_map = st.dictionaries(keys, st.integers(-1000, 1000), max_size=6)
arr_map = st.dictionaries(
    keys, st.lists(st.text(alphabet="xyz01", min_size=1, max_size=3), max_size=4),
    max_size=5,
)
MAPS_SETTINGS = settings(max_examples=10, deadline=None)


def _py_sum_merge(a, b):
    out = dict(a or {})
    for k, v in (b or {}).items():
        out[k] = out.get(k, 0) + v
    return out


def _py_union_merge(a, b):
    out = {k: sorted(set(v)) for k, v in (a or {}).items()}
    for k, v in (b or {}).items():
        out[k] = sorted(set(out.get(k, [])) | set(v))
    return out


@given(st.lists(st.tuples(int_map, int_map), min_size=1, max_size=8))
@MAPS_SETTINGS
def test_merge_maps_sum_matches_python_and_commutes(spark, batch):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(batch)],
        "i int, a map<string,int>, b map<string,int>",
    )
    rows = df.select(
        "i",
        M.merge_maps_sum("a", "b").alias("ab"),
        M.merge_maps_sum("b", "a").alias("ba"),
    ).collect()
    for r in rows:
        a, b = batch[r["i"]]
        want = _py_sum_merge(a, b)
        assert r["ab"] == want
        assert r["ba"] == want  # commutative


@given(st.lists(st.tuples(int_map, int_map, int_map), min_size=1, max_size=6))
@MAPS_SETTINGS
def test_merge_maps_sum_associative(spark, batch):
    df = spark.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(batch)],
        "i int, a map<string,int>, b map<string,int>, c map<string,int>",
    )
    ab_c = M.merge_maps_sum(M.merge_maps_sum("a", "b"), "c")
    a_bc = M.merge_maps_sum("a", M.merge_maps_sum("b", "c"))
    for r in df.select("i", ab_c.alias("l"), a_bc.alias("r")).collect():
        assert r["l"] == r["r"]


@given(st.lists(st.tuples(arr_map, arr_map), min_size=1, max_size=6))
@MAPS_SETTINGS
def test_merge_maps_array_union_matches_python_and_idempotent(spark, batch):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(batch)],
        "i int, a map<string,array<string>>, b map<string,array<string>>",
    )
    rows = df.select(
        "i",
        M.merge_maps_array_union("a", "b").alias("ab"),
        M.merge_maps_array_union(
            M.merge_maps_array_union("a", "b"), "b"
        ).alias("ab_b"),
    ).collect()
    for r in rows:
        a, b = batch[r["i"]]
        want = _py_union_merge(a, b)
        assert r["ab"] == want
        assert r["ab_b"] == want  # re-applying an absorbed side is a no-op


@given(st.lists(int_map, min_size=1, max_size=8))
@MAPS_SETTINGS
def test_prefix_then_strip_roundtrip(spark, batch):
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(batch)], "i int, m map<string,int>"
    )
    prefixed = M.prefix_map_keys("m", "0x38")
    stripped = F.transform_keys(
        prefixed, lambda k, v: F.regexp_replace(k, "^0x38_", "")
    )
    for r in df.select("i", stripped.alias("back")).collect():
        assert r["back"] == batch[r["i"]]
