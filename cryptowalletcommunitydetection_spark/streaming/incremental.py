"""Incremental / streaming execution (SURVEY.md §2.8).

The reference runs forever-loop schedulers that advance a ``last_synced``
text-file cursor after each tumbling window
(jobs/cli_job.py:24-54, utils/file_utils.py:51-66,
cli/exchange_deposit_wallets.py:84-97,121-123). Two rebuilds:

- ``IncrementalRunner`` — batch-incremental with a JSON cursor manifest:
  idempotent windows (a killed run re-processes at most the window in
  flight; the sink write for window w lands under a per-window path, so
  replays overwrite rather than duplicate).
- ``available_now_stream`` — Structured Streaming over a file source
  with ``Trigger.AvailableNow`` + checkpointLocation for the same
  catch-up semantics managed by Spark itself.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class IncrementalRunner:
    """Tumbling-window incremental driver with a persisted cursor.

    ``process(lo, hi)`` is invoked once per window [lo, hi); the cursor
    advances only after the callback returns, exactly like the
    reference's post-batch ``update_last_synced_file``
    (cli/exchange_deposit_wallets.py:121-123) but crash-safe (atomic
    rename, windows idempotent by construction).
    """

    def __init__(self, cursor_dir: str, start: int, period: int):
        self.cursor_path = os.path.join(cursor_dir, "cursor.json")
        os.makedirs(cursor_dir, exist_ok=True)
        self.period = period
        if os.path.exists(self.cursor_path):
            with open(self.cursor_path) as f:
                stored = json.load(f)
            # window idempotence (per-window sink paths overwrite on
            # replay) only holds if window boundaries never move: a
            # resume with a different period would misalign every
            # subsequent window, so it is an error, not a silent retune
            if stored.get("period") != period:
                raise ValueError(
                    f"cursor at {self.cursor_path} was written with "
                    f"period={stored.get('period')}; refusing to resume "
                    f"with period={period} (window boundaries would shift)"
                )
            self.cursor = stored["last_synced"]
        else:
            self.cursor = start
            self._persist()

    def _persist(self) -> None:
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_synced": self.cursor, "period": self.period}, f)
        os.replace(tmp, self.cursor_path)

    def run_until(self, end: int, process: Callable[[int, int], None]) -> int:
        """Process windows [cursor, cursor+period) until ``end``;
        returns the number of windows processed."""
        n = 0
        while self.cursor + self.period <= end:
            lo, hi = self.cursor, self.cursor + self.period
            process(lo, hi)
            self.cursor = hi
            self._persist()
            n += 1
        return n


def available_now_stream(
    spark: SparkSession,
    path: str,
    schema,
    transform: Callable[[DataFrame], DataFrame],
    checkpoint_dir: str,
    out_path: str,
    fmt: str = "parquet",
):
    """File-source stream, catch-up-and-stop (Trigger.AvailableNow).

    The Spark-native replacement for the reference's scheduler loop:
    watermark/exactly-once state lives in ``checkpoint_dir`` instead of a
    hand-written last_synced file.
    """
    stream = spark.readStream.format(fmt).schema(schema).load(path)
    out = transform(stream)
    q = (
        out.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
