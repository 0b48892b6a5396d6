"""Incremental runner + Structured Streaming catch-up (SURVEY.md §2.8)."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cryptowalletcommunitydetection_spark.streaming import (
    IncrementalRunner,
    available_now_stream,
)


def test_incremental_runner_cursor(tmp_path):
    seen = []
    r = IncrementalRunner(str(tmp_path), start=0, period=100)
    n = r.run_until(350, lambda lo, hi: seen.append((lo, hi)))
    assert n == 3
    assert seen == [(0, 100), (100, 200), (200, 300)]
    with open(os.path.join(str(tmp_path), "cursor.json")) as f:
        assert json.load(f)["last_synced"] == 300
    # resume: a new runner picks up the persisted cursor
    seen2 = []
    r2 = IncrementalRunner(str(tmp_path), start=0, period=100)
    assert r2.run_until(500, lambda lo, hi: seen2.append((lo, hi))) == 2
    assert seen2 == [(300, 400), (400, 500)]


def test_available_now_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    events.write.parquet(src)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # stateless incremental transform (append mode, parquet sink);
    # windowed-agg streaming lives behind the same shim with a memory sink
    transform = lambda df: df.filter(F.col("value") > 0).select(
        "event_id", "ts", "event_type", "value"
    )
    available_now_stream(spark, src, events.schema, transform, ckpt, out)
    result = spark.read.parquet(out)
    before = result.count()
    assert before > 0
    # re-run with same checkpoint: no new input -> no duplicate output
    available_now_stream(spark, src, events.schema, transform, ckpt, out)
    assert spark.read.parquet(out).count() == before


def test_streaming_windowed_agg_memory_sink(spark, tmp_path):
    src = str(tmp_path / "src2")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_agg")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select sum(n) as total from win_agg").collect()[0]["total"]
    assert got == 500
