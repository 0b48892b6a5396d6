"""Property-based check: asof_join(backward) must agree with pandas
merge_asof on arbitrary inputs (pandas is the independent oracle).

Hypothesis drives the input shapes; one shared SparkSession (conftest)
keeps runs fast, and deadline=None because Spark actions are not
millisecond-scale."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from cryptowalletcommunitydetection_spark.functions.timeseries import asof_join

KEYS = ["u1", "u2", "u3"]


@st.composite
def asof_inputs(draw):
    left = draw(
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
            min_size=1, max_size=12,
        )
    )
    # right unique per (key, ts) — the operator's documented contract
    right = draw(
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.integers(0, 50), st.integers(-5, 5)),
            min_size=0, max_size=12,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    return left, right


@given(asof_inputs())
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_pandas_merge_asof(spark, data):
    left_rows, right_rows = data
    left_pdf = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["user", "ts", "rowid"],
    )
    right_pdf = pd.DataFrame(right_rows, columns=["user", "ts", "val"])

    l = spark.createDataFrame(left_pdf, schema="user string, ts long, rowid long")
    if len(right_pdf):
        r = spark.createDataFrame(right_pdf, schema="user string, ts long, val long")
    else:
        r = spark.createDataFrame([], schema="user string, ts long, val long")

    got = {
        row["rowid"]: row["val"]
        for row in asof_join(l, r, on="ts", by="user").collect()
    }

    if len(right_pdf):
        expected_pdf = pd.merge_asof(
            left_pdf.sort_values(["ts", "rowid"]),
            right_pdf.sort_values("ts"),
            on="ts", by="user", direction="backward",
        )
        expected = {
            int(row.rowid): (None if pd.isna(row.val) else int(row.val))
            for row in expected_pdf.itertuples()
        }
    else:
        expected = {int(r_.rowid): None for r_ in left_pdf.itertuples()}

    assert got == expected


def test_asof_join_column_collision_suffixed(spark):
    """Right payload columns colliding with a left column come back as
    <col>_right (pandas merge_asof convention) instead of a duplicate."""
    from cryptowalletcommunitydetection_spark.functions.timeseries import asof_join

    left = spark.createDataFrame(
        [("u", 5, 50), ("u", 9, 90)], "uid string, ts long, value long"
    )
    right = spark.createDataFrame(
        [("u", 4, 1), ("u", 8, 2)], "uid string, ts long, value long"
    )
    out = asof_join(left, right, on="ts", by="uid")
    assert sorted(out.columns) == ["ts", "uid", "value", "value_right"]
    rows = {r["ts"]: (r["value"], r["value_right"]) for r in out.collect()}
    assert rows == {5: (50, 1), 9: (90, 2)}


def test_asof_join_strict_rejects_duplicate_right_ts(spark):
    """strict=True fails loudly when the right side violates the
    unique-per-(by, on) contract; a unique right side passes through."""
    import pytest

    left = spark.createDataFrame([("u", 5, 50)], "uid string, ts long, value long")
    dup_right = spark.createDataFrame(
        [("u", 4, 1), ("u", 4, 2)], "uid string, ts long, val long"
    )
    with pytest.raises(ValueError, match="ambiguous"):
        asof_join(left, dup_right, on="ts", by="uid", strict=True)

    ok_right = spark.createDataFrame(
        [("u", 4, 1), ("u", 3, 2)], "uid string, ts long, val long"
    )
    rows = asof_join(left, ok_right, on="ts", by="uid", strict=True).collect()
    assert len(rows) == 1 and rows[0]["val"] == 1
