"""Incremental edge-table maintenance (S9/S10/T1 at the graph layer).

At the 10^12-file posture the co-occurrence graph cannot be re-derived
from scratch per ingest batch. Incremental derivation is EXACT here
because co-occurrence groups are (repo, commit) and a commit's files
arrive atomically: a new batch's groups are disjoint from every earlier
batch's, so no pair ever spans batches — deriving the delta's edges and
weight-summing them into the table reproduces the full derivation
bit-for-bit (tests/test_edge_log.py pins this).

``EdgeLog`` is the log-structured store for those deltas on plain
Parquet (the reference's analogue: per-window Mongo upserts advancing a
last_synced cursor, cli/exchange_deposit_wallets.py:84-123):

- ``append(delta, batch_id)`` writes the delta's canonical edges as an
  immutable Parquet segment — NO read or shuffle of the existing table
  (an ingest batch costs O(|delta|), not O(|table|)),
- ``read()`` returns the merged canonical view: base ∪ pending deltas,
  weights summed. Until compaction, readers pay one groupBy over
  base+deltas — the classic LSM read amplification,
- ``compact()`` materializes the merged view as the new base and
  retires the deltas (run it every K batches or when the delta bytes
  cross a threshold),
- the manifest (atomic os.replace, same pattern as
  plans/checkpoint.RunManifest and streaming.IncrementalRunner) records
  applied batch ids: replaying an already-applied batch is a NO-OP, so
  a crashed-and-restarted ingest loop is idempotent. A crash between
  segment write and manifest update leaves an orphan directory that is
  never read and is overwritten on retry.

On a real lakehouse catalog, ``append`` + ``compact`` collapse into one
transactional ``MERGE INTO`` (operators/relational.merge_upsert_table);
this module is the catalog-free equivalent with the same semantics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_edge_deltas(existing: DataFrame | None, delta: DataFrame) -> DataFrame:
    """canonical ⊎ canonical -> canonical: same unordered pair's weights
    sum; the (src < dst, one-row-per-pair, no self-loop) contract is
    closed under this merge."""
    if existing is None:
        return delta
    return (
        existing.select("src", "dst", "weight")
        .unionByName(delta.select("src", "dst", "weight"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


class EdgeLog:
    """Log-structured canonical edge table under ``root``.

    Single-writer: the manifest swap is atomic against READERS (they see
    either the old or the new state), but two concurrent writers would
    lose one of their manifest updates — serialize ingest (the upstream
    is a cursor/stream loop, naturally serial) or move to a catalog
    table where MERGE INTO provides the transaction.

    Auto-compaction policy: every ``append`` that leaves at least
    ``compact_every`` pending delta segments (default 16), or — when
    ``max_pending_bytes`` is set — whose pending segments exceed that
    many bytes on disk, triggers ``compact()`` inline. Read
    amplification grows with the pending-segment count (the merged view
    scans base + every delta and pays per-file open/footer cost long
    before the groupBy does; measured in BENCH/BASELINE.md: read wall
    grows roughly linearly in segment count at fixed data size), while
    compaction cost is one table rewrite — amortized O(|table|/K) per
    ingest at ``compact_every=K``. Set ``compact_every=None`` AND leave
    ``max_pending_bytes`` unset to manage compaction manually (the
    pre-round-4 behavior). ``auto_compactions`` counts policy-triggered
    compactions for observability."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        compact_every: int | None = 16,
        max_pending_bytes: int | None = None,
    ):
        self.spark = spark
        self.root = root
        self.compact_every = compact_every
        self.max_pending_bytes = max_pending_bytes
        self.auto_compactions = 0
        self.manifest_path = os.path.join(root, "manifest.json")
        os.makedirs(root, exist_ok=True)
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self._m = json.load(f)
        else:
            self._m = {"base": None, "deltas": [], "applied": []}
            self._persist()
        # O(1) replay checks; the list in the manifest keeps order for
        # humans. The manifest grows with ingest history (ids are short
        # strings — MBs after millions of batches); acceptable for the
        # plain-parquet fallback, a catalog MERGE subsumes it entirely.
        self._applied = set(self._m["applied"])

    def _persist(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._m, f)
        os.replace(tmp, self.manifest_path)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    # -------------------------------------------------------- ingest
    def append(self, delta: DataFrame, batch_id: str) -> bool:
        """Write one ingest batch's canonical edges. Returns False (and
        writes nothing) if ``batch_id`` was already applied — replay
        safety for at-least-once upstream delivery."""
        if batch_id in self._applied:
            return False
        seg = f"delta_{batch_id}"
        delta.select("src", "dst", "weight").write.mode("overwrite").parquet(
            self._path(seg)
        )
        self._m["deltas"].append(seg)
        self._m["applied"].append(batch_id)
        self._applied.add(batch_id)
        self._persist()
        if self._policy_due():
            self.compact()
            self.auto_compactions += 1
        return True

    def _pending_bytes(self) -> int:
        """On-disk bytes across pending delta segments (walks the
        segment dirs — cheap relative to the parquet write that
        precedes every call)."""
        total = 0
        for seg in self._m["deltas"]:
            for dirpath, _, files in os.walk(self._path(seg)):
                for fn in files:
                    try:
                        total += os.path.getsize(os.path.join(dirpath, fn))
                    except OSError:
                        pass
        return total

    def _policy_due(self) -> bool:
        n = len(self._m["deltas"])
        if n == 0:
            return False
        if self.compact_every is not None and n >= self.compact_every:
            return True
        return (
            self.max_pending_bytes is not None
            and self._pending_bytes() >= self.max_pending_bytes
        )

    # --------------------------------------------------------- query
    def read(self) -> DataFrame | None:
        """Merged canonical view (None when the log is empty). Lazy: the
        base ∪ deltas groupBy runs inside the consumer's plan, so a
        downstream filter/projection is pushed below the union into
        every segment scan."""
        parts = []
        if self._m["base"]:
            parts.append(self.spark.read.parquet(self._path(self._m["base"])))
        if self._m["deltas"]:
            # all pending deltas as ONE multi-path scan (same schema by
            # construction) — a per-segment unionByName chain would grow
            # the plan tree linearly in segment count and slow analysis
            # long before execution does
            parts.append(
                self.spark.read.parquet(
                    *[self._path(d) for d in self._m["deltas"]]
                )
            )
        if not parts:
            return None
        out = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        if not self._m["deltas"] or (
            self._m["base"] is None and len(self._m["deltas"]) == 1
        ):
            # base-only, or a single delta segment: already canonical
            return out
        return out.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))

    # ----------------------------------------------------- maintenance
    def compact(self, vacuum: bool = True) -> int:
        """Materialize the merged view as the new base and retire the
        deltas. Returns the number of retired delta segments. The new
        base is written under a fresh versioned name first and the
        manifest swap is atomic, so readers of the OLD manifest keep a
        consistent (old base + old deltas) view throughout.

        ``vacuum`` (default) deletes the retired delta segments and the
        previous base AFTER the swap — without it every compaction
        would leak a full table copy. A reader that loaded the old
        manifest and is still mid-scan can fail under vacuum; pass
        ``vacuum=False`` and collect garbage out-of-band when readers
        overlap compactions (the catalog MERGE variant gets snapshot
        isolation for free)."""
        import shutil

        n = len(self._m["deltas"])
        if n == 0:
            return 0
        old_base = self._m["base"]
        retired = list(self._m["deltas"])
        version = len(self._m["applied"]) + (0 if old_base is None else 1)
        new_base = f"base_v{version}"
        merged = self.read()
        merged.write.mode("overwrite").parquet(self._path(new_base))
        self._m["base"] = new_base
        self._m["deltas"] = []
        self._persist()
        if vacuum:
            for seg in retired:
                shutil.rmtree(self._path(seg), ignore_errors=True)
            if old_base is not None:
                shutil.rmtree(self._path(old_base), ignore_errors=True)
        return n


def incremental_derive(
    spark: SparkSession,
    new_files: DataFrame,
    log: EdgeLog,
    batch_id: str,
    max_entities_per_group: int | None = 1000,
    engine: str = "arrow",
) -> bool:
    """One ingest step: derive the new batch's co-occurrence edges and
    append them to the log. Exact against full re-derivation as long as
    each (repo, commit) group is wholly contained in one batch (commits
    are atomic upstream — a split group WOULD lose its cross-batch
    pairs, so the ingest boundary must be the commit, never the file).
    """
    from ..graph.edges import derive_edges

    delta = derive_edges(
        new_files, max_entities_per_group=max_entities_per_group, engine=engine
    )
    return log.append(delta, batch_id)


def stream_files_into_log(
    spark: SparkSession,
    files_path: str,
    schema,
    log: EdgeLog,
    checkpoint_dir: str,
    max_entities_per_group: int | None = 1000,
    engine: str = "arrow",
    max_files_per_trigger: int | None = None,
):
    """Continuous ingest: a file-source stream over the files table
    drives ``incremental_derive`` through ``foreachBatch``.

    Exactly-once composition: Spark's streaming checkpoint guarantees
    each micro-batch id is delivered at-least-once to foreachBatch, and
    ``EdgeLog.append``'s manifest makes the apply idempotent per batch
    id — together, every file contributes to the edge table exactly
    once across crashes and restarts. The batch boundary is whatever
    the source groups into a micro-batch, so the commit-atomicity
    requirement of ``incremental_derive`` holds as long as one commit's
    files land in one source file (the writer contract upstream).

    Micro-batch ids are only unique WITHIN one checkpoint lineage: a
    recreated checkpoint restarts them at 0 (and a fresh file-source
    checkpoint re-reads every file, which would double-ingest the whole
    table). To make that misuse loud instead of silently wrong, the log
    and the checkpoint are BOUND on first use — a sentinel file in the
    checkpoint dir carries an epoch id recorded in the manifest; a
    stream whose checkpoint epoch does not match the log raises instead
    of dropping or doubling batches.

    Trigger.AvailableNow: catch up on everything present, then stop —
    the scheduler-loop replacement (run it from cron / the reference's
    forever loop). Returns the finished StreamingQuery.
    """
    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    sentinel = os.path.join(checkpoint_dir, "_edge_log_binding.json")
    bound = log._m.get("stream_epoch")
    if os.path.exists(sentinel):
        with open(sentinel) as f:
            epoch = json.load(f)["epoch"]
        if bound is not None and bound != epoch:
            raise ValueError(
                f"checkpoint at {checkpoint_dir} (epoch {epoch}) is not the "
                f"one bound to this edge log (epoch {bound}); streaming "
                "batch ids would collide with already-applied ones. Use the "
                "original checkpoint, or start a fresh EdgeLog."
            )
    else:
        if bound is not None:
            raise ValueError(
                f"this edge log is bound to a previous checkpoint (epoch "
                f"{bound}) but {checkpoint_dir} has no binding sentinel — a "
                "fresh checkpoint would re-read every source file AND reuse "
                "batch ids. Rebuild into a fresh EdgeLog instead."
            )
        epoch = uuid.uuid4().hex
        with open(sentinel, "w") as f:
            json.dump({"epoch": epoch, "log_root": log.root}, f)
    if bound is None:
        log._m["stream_epoch"] = epoch
        log._persist()

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(files_path)

    def sink(batch_df, batch_id):
        incremental_derive(
            spark,
            batch_df,
            log,
            batch_id=f"stream_{epoch}_{batch_id}",
            max_entities_per_group=max_entities_per_group,
            engine=engine,
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
