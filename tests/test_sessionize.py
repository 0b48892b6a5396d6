"""Gap-based sessionization, batch + streaming (SURVEY.md §2.8 T7/W2).

Batch oracle: DuckDB gaps-and-islands over the same parquet. Streaming:
F.session_window through a multi-micro-batch file stream; closed
sessions must agree with the batch formulation on membership.
"""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark.functions.timeseries import (
    sessionize,
    sessionize_stream,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"
GAP = 7200


def test_sessionize_matches_duckdb_oracle(spark):
    df = spark.read.parquet(EVENTS).select(
        F.col("user_id").alias("key"), F.col("ts").cast("timestamp").alias("ts")
    )
    got = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, gap=GAP).collect()
    }
    want = {
        (r[0], r[1], r[2], r[3])
        for r in duckdb.sql(f"""
            WITH e AS (
              SELECT user_id AS key, ts,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) >= {GAP}
                          THEN 1 ELSE 0 END AS new_s
              FROM read_parquet('{EVENTS}')
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT key, ts,
                     sum(new_s) OVER (PARTITION BY key ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM e
            )
            SELECT key, min(ts), max(ts), count(*) FROM s
            GROUP BY key, sid
        """).fetchall()
    }
    assert got == want


def test_sessionize_single_shuffle_window(spark):
    df = spark.read.parquet(EVENTS).select(
        F.col("user_id").alias("key"), F.col("ts").cast("timestamp").alias("ts")
    )
    plan = sessionize(df, gap=GAP)._jdf.queryExecution().executedPlan().toString()
    # ONE exchange total: both Window operators share the (key, ts)
    # clustering, and the closing (key, _sid) groupBy is satisfied by
    # the hash partitioning on key — fully partition-local aggregation
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 2


def test_sessionize_stream_matches_batch_on_closed_sessions(spark, tmp_path):
    import datetime as dt

    src = str(tmp_path / "src")
    rows1 = [(1, 0), (1, 10), (2, 5)]
    rows2 = [(1, 4000), (2, 9000), (1, 9100)]
    # sentinel far in the future pushes the watermark past every real
    # session so availableNow emits them all
    rows3 = [(99, 10_000_000)]
    base = dt.datetime(2024, 1, 1)
    for rows in (rows1, rows2, rows3):
        pdf = pd.DataFrame(
            [(k, base + dt.timedelta(seconds=s)) for (k, s) in rows],
            columns=["key", "ts"],
        )
        spark.createDataFrame(pdf, "key long, ts timestamp").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema("key long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = sessionize_stream(stream, gap=GAP, watermark="0 seconds")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["key"], r["session_start"], r["n_events"])
        for r in spark.table("sess_stream").collect()
        if r["key"] != 99
    }
    batch = spark.createDataFrame(
        [(k, base + dt.timedelta(seconds=s)) for rows in (rows1, rows2) for (k, s) in rows],
        "key long, ts timestamp",
    )
    want = {
        (r["key"], r["session_start"], r["n_events"])
        for r in sessionize(batch, gap=GAP).collect()
    }
    assert got == want
    # membership sanity: key 1 -> sessions {0,10,4000} then {9100}? no:
    # gaps are 3990 and 5100, both < 7200 -> ONE session of 4 events
    assert (1, base, 4) in got
