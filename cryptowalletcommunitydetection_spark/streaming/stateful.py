"""Custom stateful streaming operator (SURVEY.md §2.8, T1/T6).

The reference accumulates per-wallet state ACROSS scheduler windows by
re-reading Mongo each window and merging in Python: ``Wallet`` keeps
``last_updated_at`` plus set-union tag/protocol fields
(models/wallet/wallet.py:7-45), ``WalletDepositExchange`` set-unions
``depositedExchanges`` (models/wallet/wallet_deposit_exchange.py:16-38),
and the forever-loop scheduler advances a cursor between windows
(cli/exchange_deposit_wallets.py:84-123). That round-trips the whole
state table through the external store once per window.

Spark-native rebuild: ``applyInPandasWithState`` keeps the per-key state
in Spark's checkpointed state store — no external round-trip, updated
incrementally per micro-batch, exactly-once under the streaming
checkpoint. Arrow moves each group's batch rows into pandas; the merge
itself is vectorized (sum/max/set-union per batch, not per row).

State TTL (T6): with ``ttl_minutes`` set, a key whose state has not been
touched for that long (in EVENT time, judged against the watermark) is
dropped — the streaming twin of ``functions/timeseries.ttl_prune``.
Event-time timeout is used rather than processing-time so replays and
catch-up runs (Trigger.AvailableNow) age state deterministically with
the data, not with the wall clock.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

OUT_SCHEMA = (
    "wallet string, n_events long, total_value double, "
    "last_ts long, tags array<string>"
)
STATE_SCHEMA = (
    "n_events long, total_value double, last_ts long, tags array<string>"
)


def _merged(state: Any, pdf_iter: Iterator[pd.DataFrame]) -> tuple:
    """Fold this micro-batch's rows into (n, total, last_ts, tags)."""
    if state.exists:
        n, total, last_ts, tags = state.get
        tags = set(tags)
    else:
        n, total, last_ts, tags = 0, 0.0, 0, set()
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_ts = max(last_ts, int(pdf["ts_ms"].max()))
        tags |= set(pdf["event_type"].dropna())
    return n, total, last_ts, sorted(tags)


def wallet_state_stream(
    stream,
    checkpoint_dir: str,
    out_path: str,
    ttl_minutes: int | None = None,
    key_col: str = "user_id",
):
    """Per-wallet running aggregate over a stream of transfer events.

    ``stream`` is a streaming DataFrame with (``key_col``, ts timestamp,
    value double, event_type string). Emits, in UPDATE mode, one row per
    touched wallet per micro-batch: lifetime event count, value total,
    last event time (ms), and the sorted set-union of event tags — the
    reference's ``Wallet`` merge, held in the state store instead of
    Mongo.

    Sink: ``foreachBatch`` writing each micro-batch to its own
    ``out_path/batch_id=N`` partition directory with OVERWRITE — unlike
    the memory sink this supports checkpoint recovery, and unlike a
    blind append it is idempotent: foreachBatch is at-least-once, so a
    crash between the parquet write and the streaming commit replays
    batch N, and the replay overwrites the same directory instead of
    duplicating rows. Read ``out_path`` with partition discovery; the
    latest batch_id per wallet is its current state.

    Returns the started StreamingQuery; callers own
    ``awaitTermination``/``stop``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    ttl_ms = (ttl_minutes or 0) * 60_000

    def update(key, pdf_iter, state):
        if state.hasTimedOut:
            # TTL expiry: drop the key's state; emit nothing (the
            # reference simply stops updating stale wallets — T6)
            state.remove()
            return
        n, total, last_ts, tags = _merged(state, pdf_iter)
        state.update((n, total, last_ts, tags))
        if ttl_ms:
            # age out in event time: expire once the watermark passes
            # last-touch + TTL (deterministic under replay/catch-up).
            # The max() is defensive: setTimeoutTimestamp REJECTS a
            # timestamp at/behind the current watermark (query-fatal).
            # Any row this function sees satisfies ts > watermark (late
            # rows are filtered by the same watermark), so last_ts+ttl
            # should always be ahead — the clamp is cheap insurance
            # against that ordering changing across Spark versions, not
            # a path we can currently reach.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(last_ts + ttl_ms, wm + 1))
        yield pd.DataFrame(
            {
                "wallet": [str(key[0])],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last_ts],
                "tags": [tags],
            }
        )

    # watermark is required for EventTimeTimeout; harmless otherwise
    keyed = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .withColumn("ts_ms", (F.unix_timestamp("ts") * 1000).cast("long"))
        .withColumn("wallet", F.col(key_col).cast("string"))
        .groupBy("wallet")
    )
    out = keyed.applyInPandasWithState(
        update, OUT_SCHEMA, STATE_SCHEMA, "update", timeout
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={batch_id}"
        )

    return (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
