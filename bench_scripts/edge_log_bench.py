"""Incremental vs full edge-table maintenance at 200k files.

Measures the cost of ingesting ONE 10k-file batch into an EdgeLog that
already holds the other 190k files (compacted base), against re-deriving
all 200k from scratch — the maintenance choice the 10^12-file posture
forces. Appends a section to BENCH/BASELINE.md.

Run alone (no concurrent Spark jobs): python bench_scripts/edge_log_bench.py
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
    main()
