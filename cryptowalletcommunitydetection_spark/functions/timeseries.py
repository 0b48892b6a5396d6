"""Time-series / change-log operators (SURVEY.md §2.4 A8, §2.5 W1-W2).

The reference stores piecewise-constant series as nested
``{timestamp: value}`` dicts and hand-walks them (utils/utils.py:48-119,
utils/list_dict_utils.py:98-120). Here series live in long form
``(key, ts, value)`` and every operation is a window function or a
groupBy — distributable and spill-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_last_value(
    df: DataFrame, key: str = "key", ts: str = "ts", value: str = "value",
    at: int | None = None,
) -> DataFrame:
    """W1 — last value at or before ``at`` (or overall latest) per key —
    the reference's sorted-dict walk at utils/utils.py:162-181.
    Output: DataFrame[key, ts, value] (one row per key)."""
    d = df if at is None else df.filter(F.col(ts) <= F.lit(at))
    w = Window.partitionBy(key).orderBy(F.desc(ts))
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key, ts, value)
    )


def bucket_timestamps(df: DataFrame, ts: str = "ts", interval: int = 3600) -> DataFrame:
    """W2 — `round_timestamp`: int(ts/interval)*interval
    (utils/time_utils.py:10-18)."""
    return df.withColumn(
        "bucket", (F.floor(F.col(ts) / F.lit(interval)) * F.lit(interval)).cast("long")
    )


def keep_one_per_bucket(
    df: DataFrame, key: str = "key", ts: str = "ts", interval: int = 3600,
    keep: str = "last",
) -> DataFrame:
    """W2 — `prune_change_logs` keeps one entry per time bucket per key
    (utils/list_dict_utils.py:75-95)."""
    b = bucket_timestamps(df, ts, interval)
    order = F.desc(ts) if keep == "last" else F.asc(ts)
    w = Window.partitionBy(key, "bucket").orderBy(order)
    return (
        b.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def prune_old(df: DataFrame, ts: str = "ts", cutoff: int = 0) -> DataFrame:
    """W2/T6 — drop entries older than the TTL watermark (the 31-day null
    cut at utils/utils.py:213-218)."""
    return df.filter(F.col(ts) >= F.lit(cutoff))


def common_timestamp_grid(
    df: DataFrame,
    series: str = "key",
    ts: str = "ts",
    frequency: int = 900,
    start_time: int | None = None,
) -> DataFrame:
    """X5 — the reference's timestamp-intersection regrid
    (`get_timestamps_intersection`, utils/time_utils.py:40-75): the
    regular ``frequency``-spaced grid over the INTERSECTION of every
    series' observed span. Input: long-form ``(series, ts)`` rows (extra
    columns ignored); output: DataFrame[ts] — one row per grid point
    ``start, start+f, ..., <= end`` where ``start = max over series of
    min(ts)`` and ``end = min over series of max(ts)``.

    ``start_time`` clips the grid's left edge exactly as the reference
    does: the start is bucket-floored (``round_timestamp``) and bumped
    one frequency forward if the floor lands before ``start_time``.

    Raises ``ValueError`` when the spans don't intersect (the reference
    logs an error and returns None — silent None poisons downstream
    joins, so this engine fails loudly).

    Scale shape: ONE two-level aggregate (per-series min/max with
    map-side combine, then two scalars to the driver) + a distributed
    ``spark.range`` for the grid itself — no per-row Python, no driver
    materialization of the grid, safe for spans of any length."""
    b = df.groupBy(series).agg(
        F.min(F.col(ts)).alias("_lo"), F.max(F.col(ts)).alias("_hi")
    )
    row = b.agg(F.max("_lo").alias("lo"), F.min("_hi").alias("hi")).collect()[0]
    if row["lo"] is None:
        raise ValueError("common_timestamp_grid: input has no series")
    start, end = int(row["lo"]), int(row["hi"])
    if start_time is not None and start < start_time:
        start = (start_time // frequency) * frequency
        if start < start_time:
            start += frequency
    if start > end:
        raise ValueError(
            f"common_timestamp_grid: series spans do not intersect "
            f"(start {start} > end {end})"
        )
    n = (end - start) // frequency + 1
    return df.sparkSession.range(n).select(
        (F.lit(start) + F.col("id") * F.lit(frequency)).cast("long").alias(ts)
    )


def regrid_carry_forward(
    df: DataFrame,
    series: str = "key",
    ts: str = "ts",
    value: str = "value",
    frequency: int = 900,
    start_time: int | None = None,
) -> DataFrame:
    """X5/A8 — align every series onto the common intersection grid,
    carrying each series' last observation forward onto each grid point
    (the reference pairs `get_timestamps_intersection` with its
    sorted-dict walk to sample each wallet's balance log on the unified
    grid). Output: DataFrame[series, ts, value] — dense |series|x|grid|.

    One union + one window pass (the ``asof_join`` mechanics): grid
    marker rows interleave with observations per series, ordered by
    (ts, marker-last), and ``last(value, ignorenulls)`` over the
    preceding frame fills each marker. Every series has an observation
    at/before every grid point by construction of the intersection
    grid, so the result has no nulls."""
    grid = common_timestamp_grid(
        df, series=series, ts=ts, frequency=frequency, start_time=start_time
    )
    keys = df.select(F.col(series).alias(series)).distinct()
    markers = keys.crossJoin(grid).select(
        series, ts, F.lit(None).cast(df.schema[value].dataType).alias(value),
        F.lit(1).alias("_g"),
    )
    obs = df.select(series, ts, value).withColumn("_g", F.lit(0))
    w = (
        Window.partitionBy(series)
        .orderBy(ts, "_g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        obs.unionByName(markers)
        .withColumn("_ff", F.last(value, ignorenulls=True).over(w))
        .filter(F.col("_g") == 1)
        .select(series, ts, F.col("_ff").alias(value))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """J6 — as-of join: attach to each left row the right row with the
    greatest ``on`` <= left's ``on`` (backward; ties include equal
    timestamps), matched within ``by`` keys. Right-side payload columns
    that collide with a left column are emitted as ``<c><suffix>``
    (pandas ``merge_asof`` convention) so by-name selection downstream
    stays unambiguous.

    The reference does this with a cached interpolation search over the
    monotone (block, timestamp) graph per lookup
    (services/blockchain/graph_operations.py:33-120,
    models/blocks.py:46-71). Here it is one union + one window pass —
    O((n+m) log (n+m)) with a single shuffle on ``by``, no per-row
    driver loops, and it distributes: each ``by`` partition is
    independent.

    ``right`` must be unique per (by, on); duplicate timestamps would
    make "the" as-of row ambiguous (pre-aggregate to enforce). The
    default trusts the caller's contract (no extra action on the hot
    path); ``strict=True`` spends one existence-probe job to verify and
    raises ``ValueError`` on ambiguity instead of silently picking the
    union-order winner.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    if strict:
        dup = (
            right.groupBy(*by, on)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "asof_join: right side has duplicate rows per "
                f"({', '.join(by) or 'global'}, {on}) — the as-of row is "
                "ambiguous; pre-aggregate the right side (e.g. "
                "groupBy(by, on).agg(last/max)) or pass strict=False"
            )
    rcols = [c for c in right.columns if c != on and c not in by]
    lcols = [c for c in left.columns if c != on and c not in by]

    l = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("_side"),
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    # at equal `on`, the right row sorts first (side 0) so backward
    # semantics include ties; forward reverses the scan direction
    order = [F.col(on).asc(), F.col("_side").asc()]
    if direction == "forward":
        order = [F.col(on).desc(), F.col("_side").asc()]
    elif direction != "backward":
        raise ValueError(f"unknown direction: {direction}")
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r)
    filled = u.select(
        *by,
        F.col(on),
        F.col("_side"),
        *lcols,
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in rcols],
    )
    out_names = {c: (c + suffix if c in lcols else c) for c in rcols}
    return filled.filter(F.col("_side") == 1).select(
        *by, F.col(on), *lcols,
        *[F.col(f"_r_{c}").alias(out_names[c]) for c in rcols],
    )


def carry_forward_sum(
    df: DataFrame, series: str = "key", ts: str = "ts", value: str = "value"
) -> DataFrame:
    """A8 — `combined_logs(*logs, handler_func=sum)`
    (utils/list_dict_utils.py:98-120): union of all timestamps across
    series, carry each series' last value forward, sum across series.

    Output: DataFrame[ts, combined] over the union timestamp grid.

    Scale note: the dense grid is |series| x |union timestamps| rows —
    correct for the reference's use (a handful of change-log series per
    wallet), quadratic-ish if abused with many thousands of series over
    fine-grained timestamps. In that regime, bucket timestamps first
    (``bucket_timestamps``) or window per-series with an as-of join
    instead of densifying.
    """
    grid = df.select(ts).distinct()
    keys = df.select(series).distinct()
    dense = keys.crossJoin(grid)  # |keys| is small (series count), grid is the union
    joined = dense.join(df, [series, ts], "left")
    w = (
        Window.partitionBy(series)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.withColumn("_ff", F.last(value, ignorenulls=True).over(w))
    return (
        filled.groupBy(ts)
        .agg(F.sum("_ff").alias("combined"))
        .orderBy(ts)
    )


def sessionize(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    gap: int = 1800,
) -> DataFrame:
    """W2/T7 — gap-based session windows per key (batch formulation).

    A new session starts when a key's consecutive events are ``gap``
    seconds or more apart (matching ``F.session_window``'s merge rule:
    windows [t, t+gap) merge only when they overlap, i.e. diff < gap)
    — the reference's scheduler slices activity
    into fixed tumbling windows (cli/exchange_deposit_wallets.py:27-32);
    sessionization is the data-driven window the wallet-activity domain
    actually wants (an address's burst of transfers = one session).

    Output: DataFrame[<key>, session_start, session_end, n_events] —
    one row per (key, session), ends inclusive of the last event.

    Plan shape: ONE exchange total (pinned by
    tests/test_sessionize.py::test_sessionize_single_shuffle_window).
    The session id is the classic gaps-and-islands running sum of
    new-session flags; the two window functions are sequential (the sum
    consumes the lag's output) so they are two Window operators over
    the SAME (key, ts) clustering — no second shuffle — and the closing
    groupBy on (key, _sid) is satisfied by the existing hash
    partitioning on key (subset clustering), so it aggregates entirely
    partition-locally.

    For true streams, prefer ``sessionize_stream`` (F.session_window:
    state-store merged, watermark-closed).
    """
    w = Window.partitionBy(key).orderBy(ts)
    flagged = df.select(
        key,
        F.col(ts).alias("_ts"),
        F.when(
            F.col(ts).cast("long")
            - F.lag(F.col(ts).cast("long")).over(w)
            >= gap,
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    sid = flagged.withColumn(
        "_sid",
        F.sum("_new").over(
            Window.partitionBy(key)
            .orderBy("_ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sid.groupBy(key, "_sid").agg(
        F.min("_ts").alias("session_start"),
        F.max("_ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("_sid")


def sessionize_stream(
    stream: DataFrame,
    key: str = "key",
    ts: str = "ts",
    gap: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """T7 streaming twin of ``sessionize``: ``F.session_window`` merges
    overlapping per-event windows in the state store; sessions close
    (emit, append mode) once the watermark passes the session end.
    Session membership matches the batch formulation exactly; the ONE
    convention difference is ``session_end`` = last event + ``gap``
    (the window's half-open end) where batch reports the last event
    itself. Returns the aggregated streaming DataFrame; caller attaches
    the sink."""
    return (
        stream.withColumn(ts, F.col(ts).cast("timestamp"))
        .withWatermark(ts, watermark)
        .groupBy(key, F.session_window(F.col(ts), f"{gap} seconds").alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
        )
    )
