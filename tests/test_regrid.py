"""X5 regrid: common_timestamp_grid must agree with a pure-Python
recomputation of the reference's get_timestamps_intersection
(/root/reference/utils/time_utils.py:40-75) on arbitrary inputs, and
regrid_carry_forward must agree with a pandas ffill-on-grid oracle.

Hypothesis drives the input shapes; deadline=None because Spark actions
are not millisecond-scale."""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from cryptowalletcommunitydetection_spark.functions.timeseries import (
    common_timestamp_grid,
    regrid_carry_forward,
)


def _ref_grid(ts_lists, frequency, start_time=None):
    """Pure-Python recomputation of the reference algorithm (sans the
    `now` clamp, which is wall-clock state, not data)."""
    start = max(min(l) for l in ts_lists)
    end = min(max(l) for l in ts_lists)
    if start_time is not None and start < start_time:
        start = (start_time // frequency) * frequency
        if start < start_time:
            start += frequency
    if start > end:
        return None
    out = []
    while start <= end:
        out.append(start)
        start += frequency
    return out


@st.composite
def grid_inputs(draw):
    n_series = draw(st.integers(1, 4))
    lists = [
        draw(st.lists(st.integers(0, 400), min_size=1, max_size=10))
        for _ in range(n_series)
    ]
    frequency = draw(st.sampled_from([1, 7, 15, 60]))
    start_time = draw(st.one_of(st.none(), st.integers(0, 400)))
    return lists, frequency, start_time


def _df(spark, lists):
    rows = [(f"s{i}", t) for i, l in enumerate(lists) for t in l]
    return spark.createDataFrame(rows, schema="key string, ts long")


@given(grid_inputs())
@settings(max_examples=15, deadline=None)
def test_common_grid_matches_reference_algorithm(spark, data):
    lists, frequency, start_time = data
    want = _ref_grid(lists, frequency, start_time)
    df = _df(spark, lists)
    if want is None:
        with pytest.raises(ValueError):
            common_timestamp_grid(
                df, series="key", ts="ts", frequency=frequency,
                start_time=start_time,
            )
        return
    got = sorted(
        r["ts"]
        for r in common_timestamp_grid(
            df, series="key", ts="ts", frequency=frequency,
            start_time=start_time,
        ).collect()
    )
    assert got == want


def test_regrid_carry_forward_matches_pandas(spark):
    rows = [
        ("a", 0, 1.0), ("a", 10, 2.0), ("a", 35, 3.0),
        ("b", 5, 10.0), ("b", 22, 20.0), ("b", 40, 30.0),
    ]
    df = spark.createDataFrame(rows, schema="key string, ts long, value double")
    out = regrid_carry_forward(df, series="key", ts="ts", frequency=7)
    got = {(r["key"], r["ts"]): r["value"] for r in out.collect()}

    grid = _ref_grid([[0, 10, 35], [5, 22, 40]], 7)
    want = {}
    for key, obs in (
        ("a", [(0, 1.0), (10, 2.0), (35, 3.0)]),
        ("b", [(5, 10.0), (22, 20.0), (40, 30.0)]),
    ):
        s = pd.Series(dict(obs))
        for t in grid:
            want[(key, t)] = float(s[s.index <= t].iloc[-1])
    assert got == want
    # dense: |series| x |grid|, no nulls by construction
    assert len(got) == 2 * len(grid)
    assert all(v is not None for v in got.values())


def test_regrid_grid_is_distributed_range(spark):
    """The grid comes from spark.range (scale-safe), and a huge span
    does not materialize on the driver."""
    df = spark.createDataFrame(
        [("a", 0), ("a", 10_000_000), ("b", 5), ("b", 9_999_999)],
        schema="key string, ts long",
    )
    g = common_timestamp_grid(df, series="key", ts="ts", frequency=1)
    # lazy count only — 10M grid rows never hit the driver
    assert g.count() == 9_999_999 - 5 + 1
