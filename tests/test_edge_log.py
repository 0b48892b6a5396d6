"""Incremental edge derivation + log-structured edge store.

Pins the exactness claim: because co-occurrence groups are
(repo, commit) and a commit lands wholly in one ingest batch, per-batch
derivation merged through the EdgeLog equals full re-derivation — before
and after compaction — and batch replays are no-ops.
"""

from pyspark.sql import functions as F

from cryptowalletcommunitydetection_spark import datagen
from cryptowalletcommunitydetection_spark.graph.edges import derive_edges
from cryptowalletcommunitydetection_spark.sources import (
    EdgeLog,
    incremental_derive,
)


def _files(spark):
    pdf = datagen.gen_files_pdf(n_repos=9, files_per_repo=6, n_entities=30)
    return spark.createDataFrame(pdf, schema=datagen.FILES_SCHEMA)


def _as_dict(df):
    return {(r["src"], r["dst"]): r["weight"] for r in df.collect()}


def test_incremental_equals_full_derivation(spark, tmp_path):
    files = _files(spark).persist()
    # batch boundary = commit (atomic upstream): 3 disjoint batches
    commits = sorted(r["commit"] for r in files.select("commit").distinct().collect())
    cut1, cut2 = commits[len(commits) // 3], commits[2 * len(commits) // 3]
    batches = [
        files.filter(F.col("commit") <= cut1),
        files.filter((F.col("commit") > cut1) & (F.col("commit") <= cut2)),
        files.filter(F.col("commit") > cut2),
    ]

    log = EdgeLog(spark, str(tmp_path / "elog"))
    for i, b in enumerate(batches):
        assert incremental_derive(spark, b, log, batch_id=f"b{i}")

    want = _as_dict(derive_edges(files))
    assert _as_dict(log.read()) == want

    # compaction changes layout, not content
    assert log.compact() == 3
    assert _as_dict(log.read()) == want
    # second compact: nothing to do
    assert log.compact() == 0

    # replayed batch (at-least-once upstream): no-op, content unchanged
    assert not incremental_derive(spark, batches[1], log, batch_id="b1")
    assert _as_dict(log.read()) == want
    files.unpersist()


def test_edge_log_survives_reopen_and_appends_after_compact(spark, tmp_path):
    files = _files(spark).persist()
    commits = sorted(r["commit"] for r in files.select("commit").distinct().collect())
    cut = commits[len(commits) // 2]
    b1 = files.filter(F.col("commit") <= cut)
    b2 = files.filter(F.col("commit") > cut)

    root = str(tmp_path / "elog")
    log = EdgeLog(spark, root)
    incremental_derive(spark, b1, log, "b1")
    log.compact()

    # a NEW EdgeLog instance (restart) sees the manifest state
    log2 = EdgeLog(spark, root)
    assert not incremental_derive(spark, b1, log2, "b1")  # replay blocked
    assert incremental_derive(spark, b2, log2, "b2")

    want = _as_dict(derive_edges(files))
    assert _as_dict(log2.read()) == want
    # mixed base+delta read, then a second compaction round
    assert log2.compact() == 1
    assert _as_dict(log2.read()) == want
    files.unpersist()


def test_merged_view_is_canonical_for_graph_consumers(spark, tmp_path):
    """EdgeLog.read() keeps the canonical contract, so graph algorithms
    may consume it with assume_canonical=True."""
    files = _files(spark)
    log = EdgeLog(spark, str(tmp_path / "elog"))
    incremental_derive(spark, files, log, "all")
    e = log.read()
    assert e.filter(F.col("src") >= F.col("dst")).count() == 0
    assert e.count() == e.select("src", "dst").distinct().count()


def test_stream_files_into_log_exactly_once(spark, tmp_path):
    """File-source stream -> foreachBatch incremental_derive: merged
    result equals full derivation; a checkpointed re-run ingests
    nothing new."""
    from cryptowalletcommunitydetection_spark.sources import (
        stream_files_into_log,
    )

    files = _files(spark).persist()
    src = str(tmp_path / "files_src")
    commits = sorted(r["commit"] for r in files.select("commit").distinct().collect())
    cut = commits[len(commits) // 2]
    # one commit's files land wholly in one source file (writer contract)
    files.filter(F.col("commit") <= cut).coalesce(1).write.mode("append").parquet(src)
    files.filter(F.col("commit") > cut).coalesce(1).write.mode("append").parquet(src)

    log = EdgeLog(spark, str(tmp_path / "elog"))
    ck = str(tmp_path / "ck")
    stream_files_into_log(
        spark, src, files.schema, log, ck, max_files_per_trigger=1
    )
    want = _as_dict(derive_edges(files))
    assert _as_dict(log.read()) == want
    applied_before = list(log._m["applied"])

    # restart with the same checkpoint and no new input: nothing applied
    log2 = EdgeLog(spark, str(tmp_path / "elog"))
    stream_files_into_log(
        spark, src, files.schema, log2, ck, max_files_per_trigger=1
    )
    assert log2._m["applied"] == applied_before
    assert _as_dict(log2.read()) == want
    files.unpersist()


def test_stream_rejects_recreated_checkpoint(spark, tmp_path):
    """A wiped/recreated checkpoint restarts micro-batch ids at 0 and
    re-reads every source file; binding the log to the checkpoint epoch
    turns that silent drop/double into a loud error."""
    import shutil

    import pytest

    from cryptowalletcommunitydetection_spark.sources import (
        stream_files_into_log,
    )

    files = _files(spark)
    src = str(tmp_path / "files_src")
    files.coalesce(1).write.parquet(src)
    log = EdgeLog(spark, str(tmp_path / "elog"))
    ck = str(tmp_path / "ck")
    stream_files_into_log(spark, src, files.schema, log, ck)

    shutil.rmtree(ck)
    with pytest.raises(ValueError, match="bound to a previous checkpoint"):
        stream_files_into_log(spark, src, files.schema, log, ck)
    # a different checkpoint dir with its own sentinel is also rejected
    ck2 = str(tmp_path / "ck2")
    log2 = EdgeLog(spark, str(tmp_path / "elog2"))
    stream_files_into_log(spark, src, files.schema, log2, ck2)
    with pytest.raises(ValueError, match="not the one bound"):
        stream_files_into_log(spark, src, files.schema, log, ck2)


def test_auto_compaction_at_segment_count(spark, tmp_path):
    """compact_every=K: the Kth pending delta triggers an inline
    compaction; content equals full derivation throughout and replay
    idempotence survives policy-triggered compactions."""
    files = _files(spark).persist()
    commits = sorted(
        r["commit"] for r in files.select("commit").distinct().collect()
    )
    cut1, cut2 = commits[len(commits) // 3], commits[2 * len(commits) // 3]
    batches = [
        files.filter(F.col("commit") <= cut1),
        files.filter((F.col("commit") > cut1) & (F.col("commit") <= cut2)),
        files.filter(F.col("commit") > cut2),
    ]

    log = EdgeLog(spark, str(tmp_path / "elog"), compact_every=2)
    assert incremental_derive(spark, batches[0], log, "b0")
    assert len(log._m["deltas"]) == 1 and log.auto_compactions == 0
    assert incremental_derive(spark, batches[1], log, "b1")
    # second delta hit the policy: compacted inline
    assert len(log._m["deltas"]) == 0 and log._m["base"] is not None
    assert log.auto_compactions == 1
    assert incremental_derive(spark, batches[2], log, "b2")
    assert len(log._m["deltas"]) == 1  # below policy again

    want = _as_dict(derive_edges(files))
    assert _as_dict(log.read()) == want
    # replay after an auto-compaction is still a no-op
    assert not incremental_derive(spark, batches[0], log, "b0")
    assert _as_dict(log.read()) == want
    files.unpersist()


def test_auto_compaction_at_byte_threshold(spark, tmp_path):
    """max_pending_bytes: one delta whose on-disk size crosses the
    threshold triggers compaction even below the segment-count policy."""
    files = _files(spark)
    log = EdgeLog(
        spark, str(tmp_path / "elog"), compact_every=None, max_pending_bytes=1
    )
    assert incremental_derive(spark, files, log, "all")
    assert len(log._m["deltas"]) == 0 and log._m["base"] is not None
    assert log.auto_compactions == 1
    assert _as_dict(log.read()) == _as_dict(derive_edges(files))


def test_manual_compaction_mode_unchanged(spark, tmp_path):
    """compact_every=None + no byte threshold: deltas accumulate until
    the caller compacts (the pre-policy behavior)."""
    files = _files(spark).persist()
    commits = sorted(
        r["commit"] for r in files.select("commit").distinct().collect()
    )
    cut = commits[len(commits) // 2]
    log = EdgeLog(spark, str(tmp_path / "elog"), compact_every=None)
    incremental_derive(spark, files.filter(F.col("commit") <= cut), log, "b0")
    incremental_derive(spark, files.filter(F.col("commit") > cut), log, "b1")
    assert len(log._m["deltas"]) == 2 and log.auto_compactions == 0
    assert log.compact() == 2
    assert _as_dict(log.read()) == _as_dict(derive_edges(files))
    files.unpersist()
