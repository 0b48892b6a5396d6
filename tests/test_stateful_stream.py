"""applyInPandasWithState wallet accumulator (SURVEY.md §2.8 T1/T6).

Drives the operator through a real file-source stream split into one
micro-batch per file (maxFilesPerTrigger=1 under Trigger.AvailableNow),
so the asserts prove state actually persists in the state store across
batches — the property the reference gets from Mongo re-reads per
scheduler window (models/wallet/wallet.py:7-45,
cli/exchange_deposit_wallets.py:84-123).
"""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark.streaming import wallet_state_stream

_SCHEMA = "user_id long, ts timestamp, value double, event_type string"


def _write(spark, path, rows):
    df = spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), v, t)
         for (u, h, v, t) in rows],
        _SCHEMA,
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run(spark, src, ckpt, out, ttl=None):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = wallet_state_stream(stream, ckpt, out, ttl_minutes=ttl)
    q.awaitTermination()
    return spark.read.parquet(out).toPandas()


def test_state_accumulates_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    # wallet 1 appears in all three files; wallet 2 in one
    _write(spark, src, [(1, 0, 10.0, "swap"), (2, 0, 5.0, "mint")])
    _write(spark, src, [(1, 1, 20.0, "transfer")])
    _write(spark, src, [(1, 2, 30.0, "swap")])

    out = _run(spark, src, str(tmp_path / "ck"), str(tmp_path / "out"))
    # update mode appends one row per touched key per batch: wallet 1
    # must have been emitted in 3 distinct batches with growing counts
    w1 = out[out.wallet == "1"].sort_values("n_events")
    assert list(w1.n_events) == [1, 2, 3]
    final = w1.iloc[-1]
    assert final.total_value == 60.0
    assert list(final.tags) == ["swap", "transfer"]
    assert final.last_ts == int(
        dt.datetime(2024, 1, 1, 2, tzinfo=dt.timezone.utc).timestamp() * 1000
    )
    w2 = out[out.wallet == "2"]
    assert len(w2) == 1 and w2.iloc[0].n_events == 1

    # restart from the same checkpoint with no new files: recovery is
    # supported (foreachBatch sink) and nothing is re-emitted
    out2 = _run(spark, src, str(tmp_path / "ck"), str(tmp_path / "out"))
    assert len(out2) == len(out)


def test_event_time_ttl_drops_idle_state(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 0: wallet 7 at t=0h. batches 1-2: wallet 8 advances the
    # watermark hours past 7's 30-minute TTL while 7 stays idle (the
    # timeout only fires for keys with no data in the batch). batch 3:
    # wallet 7 returns — its state must have been dropped, so the count
    # restarts instead of continuing from 1.
    _write(spark, src, [(7, 0, 1.0, "swap")])
    _write(spark, src, [(8, 2, 1.0, "mint")])
    _write(spark, src, [(8, 4, 1.0, "mint")])
    _write(spark, src, [(7, 5, 2.0, "burn"), (7, 5, 3.0, "burn")])

    out = _run(spark, src, str(tmp_path / "ck"), str(tmp_path / "out"), ttl=30)
    w7 = out[out.wallet == "7"].sort_values("n_events")
    # first sighting n=1; post-expiry return restarts at 2 (not 3)
    assert list(w7.n_events) == [1, 2]
    assert w7.iloc[-1].total_value == 5.0
    assert list(w7.iloc[-1].tags) == ["burn"]


def test_no_ttl_state_survives_idle_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(spark, src, [(7, 0, 1.0, "swap")])
    _write(spark, src, [(8, 2, 1.0, "mint")])
    _write(spark, src, [(7, 5, 2.0, "burn")])

    out = _run(spark, src, str(tmp_path / "ck"), str(tmp_path / "out"))
    w7 = out[out.wallet == "7"].sort_values("n_events")
    assert list(w7.n_events) == [1, 2]
    assert w7.iloc[-1].total_value == 3.0
    assert list(w7.iloc[-1].tags) == ["burn", "swap"]
