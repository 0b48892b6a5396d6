"""Incremental vs full edge-table maintenance at 200k files.

Default mode: measures the cost of ingesting ONE 10k-file batch into an
EdgeLog that already holds the other 190k files (compacted base), against
re-deriving all 200k from scratch — the maintenance choice the
10^12-file posture forces.

``readamp`` mode: measures LSM read amplification — the merged read()
wall as a function of pending delta-segment count at fixed total data
size — the evidence behind the auto-compaction policy default
(EdgeLog.compact_every=16). Appends a section to BENCH/BASELINE.md.

Run alone (no concurrent Spark jobs):
  python bench_scripts/edge_log_bench.py [n_files]
  python bench_scripts/edge_log_bench.py readamp [n_files]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cryptowalletcommunitydetection_spark import build_session  # noqa: E402
from cryptowalletcommunitydetection_spark.datagen import (  # noqa: E402
    gen_files_distributed,
)
from cryptowalletcommunitydetection_spark.graph.edges import derive_edges  # noqa: E402
from cryptowalletcommunitydetection_spark.sources import (  # noqa: E402
    EdgeLog,
    incremental_derive,
)


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_amp_main():
    """Merged-read wall vs pending segment count, fixed data size."""
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 96_000
    n_segments = 32
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="edge-log-readamp",
                          master=f"local[{cpus}]", shuffle_partitions=cpus)
    n_repos = n_files // 20
    files = gen_files_distributed(spark, n_files=n_files, n_repos=n_repos,
                                  n_entities=50_000)
    # repo-range batches keep every (repo, commit) group whole
    per = n_repos // n_segments
    root = tempfile.mkdtemp(prefix="edge_log_readamp_")
    try:
        log = EdgeLog(spark, os.path.join(root, "elog"), compact_every=None)
        # warm the JIT/derivation path once before any timed read
        derive_edges(files).count()
        points = []
        for i in range(n_segments):
            lo, hi = f"repo_{i * per:06d}", f"repo_{(i + 1) * per:06d}"
            b = files.filter((F.col("repo") >= lo) & (F.col("repo") < hi))
            incremental_derive(spark, b, log, f"seg{i}")
            k = i + 1
            if k in (1, 2, 4, 8, 16, 32):
                # min-of-3 reads (steal-aware protocol)
                walls = []
                for _ in range(3):
                    t0 = time.monotonic()
                    n = log.read().count()
                    walls.append(round(time.monotonic() - t0, 3))
                points.append({"segments": k, "read_sec": min(walls),
                               "walls": walls, "n_edges": n})
        t0 = time.monotonic()
        log.compact()
        compact_sec = round(time.monotonic() - t0, 3)
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            log.read().count()
            walls.append(round(time.monotonic() - t0, 3))
        base_read = min(walls)
        result = {"n_files": n_files, "cpus": cpus, "points": points,
                  "compact_sec": compact_sec, "base_read_sec": base_read}
        print("RESULT " + json.dumps(result))
        rows = "\n".join(
            f"| {p['segments']} | {p['read_sec']} | {p['walls']} |"
            for p in points
        )
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(f"""
## EdgeLog read amplification — merged read() wall vs pending segment count

{n_files:,} files derived into one EdgeLog as {n_segments} equal repo-range
delta segments (manual-compaction mode), local[{cpus}]; min of 3 reads
per point. Data volume GROWS with the segment count (each append adds a
segment's worth of edges), so the per-point walls are indicative; the
CONTROLLED comparison is the last point vs the post-compaction read of
the identical data below.

| pending segments | merged read (s, min of 3) | walls |
|---|---|---|
{rows}

compact() at {n_segments} segments: {compact_sec}s; base-only read of the
SAME data after compaction: {base_read}s — read amplification
{{:.1f}}x at {n_segments} pending segments. This is the evidence behind
the auto-compaction default (``EdgeLog(compact_every=16)``): one
amortized rewrite per 16 ingests bounds the merged-read penalty, and the
policy costs nothing when ingest batches are large (byte threshold
available via ``max_pending_bytes``).
""".format(points[-1]["read_sec"] / max(base_read, 1e-9)))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    batch = 10_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="edge-log-bench", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    files = gen_files_distributed(spark, n_files=n_files, n_repos=n_files // 20,
                                  n_entities=50_000)
    # batch boundary = repo (groups are (repo, commit); repo ranges keep
    # every group whole). Persist the split inputs so the measured walls
    # are derivation, not datagen.
    n_repos = n_files // 20
    cut = f"repo_{n_repos - batch // 20:06d}"
    old = files.filter(F.col("repo") < cut).persist()
    new = files.filter(F.col("repo") >= cut).persist()
    n_old, n_new = old.count(), new.count()

    root = tempfile.mkdtemp(prefix="edge_log_bench_")
    try:
        log = EdgeLog(spark, os.path.join(root, "elog"))
        incremental_derive(spark, old, log, "base_load")
        log.compact()

        # JIT warm: one full derivation before any timed run
        derive_edges(files).count()

        results = {"n_files": n_files, "batch_files": n_new, "cpus": cpus}
        s0, t0 = steal(), time.monotonic()
        derive_edges(files).count()
        results["full_rederive_sec"] = round(time.monotonic() - t0, 3)
        results["full_steal"] = steal() - s0

        s0, t0 = steal(), time.monotonic()
        incremental_derive(spark, new, log, "b1")
        results["incremental_ingest_sec"] = round(time.monotonic() - t0, 3)
        results["ingest_steal"] = steal() - s0

        # read amplification: merged view (base + 1 delta) vs base only
        s0, t0 = steal(), time.monotonic()
        n_merged = log.read().count()
        results["merged_read_sec"] = round(time.monotonic() - t0, 3)
        results["merged_read_steal"] = steal() - s0
        results["n_edges_merged"] = n_merged

        s0, t0 = steal(), time.monotonic()
        log.compact()
        results["compact_sec"] = round(time.monotonic() - t0, 3)
        results["compact_steal"] = steal() - s0

        s0, t0 = steal(), time.monotonic()
        n_base = log.read().count()
        results["base_read_sec"] = round(time.monotonic() - t0, 3)
        results["base_read_steal"] = steal() - s0
        assert n_base == n_merged

        # exactness at this scale, not just in unit tests
        full = derive_edges(files)
        merged = log.read()
        diff = full.unionByName(merged).groupBy("src", "dst", "weight").agg(
            F.count(F.lit(1)).alias("c")
        ).filter(F.col("c") != 2).count()
        results["mismatched_rows"] = diff
        results["speedup_vs_full"] = round(
            results["full_rederive_sec"] / results["incremental_ingest_sec"], 1
        )
        print("RESULT " + json.dumps(results))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "readamp":
        read_amp_main()
    else:
        main()
