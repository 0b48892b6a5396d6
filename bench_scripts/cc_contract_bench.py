"""Round-5: measure the hash-to-min pre-contraction's effect on the
distributed CC path (VERDICT r4 task 6 — "cut the CC distributed
constant") on the same 11M-edge uniform random string-key graph as
bench_scripts/distributed_paths.py.

Protocol: one graph, REPEATS runs per config (pre_contract True/False),
min wall, result sketches must match across every run (the labels are
deterministic, so any mismatch is a correctness bug, not noise).

Usage: python bench_scripts/cc_contract_bench.py  (env: DP_E_RAW,
DP_REPEATS, SPARK_GRAFT_CPUS as in distributed_paths.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

E_RAW = int(os.environ.get("DP_E_RAW", 11_000_000))
REPEATS = int(os.environ.get("DP_REPEATS", 2))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))


def steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


def log(msg: str) -> None:
    print(f"[ccb {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    from pyspark.sql import functions as F

    from cryptowalletcommunitydetection_spark import build_session
    from cryptowalletcommunitydetection_spark.graph.cc import connected_components
    from cryptowalletcommunitydetection_spark.graph.edges import canonicalize_edges

    spark = build_session(
        app_name="cc-contract-r05",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    V = E_RAW // 3
    edges = (
        spark.range(E_RAW)
        .select(
            F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(V))).alias("src"),
            F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(V))).alias("dst"),
        )
        .persist()
    )
    edges.count()
    m = canonicalize_edges(edges).count()
    log(f"graph ready: canonical={m:,} V~{V:,}")

    def sketch(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("id", "component")).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    out = {"E_canonical": m, "V": V, "cpus": CPUS, "repeats": REPEATS, "configs": {}}
    sk_ref = None
    for name, flag in (("pre_contract", True), ("star_only", False)):
        walls, steals = [], []
        for i in range(REPEATS):
            s0, t0 = steal(), time.monotonic()
            labels = connected_components(
                spark, edges, local=False, pre_contract=flag
            )
            sk = sketch(labels)
            walls.append(round(time.monotonic() - t0, 3))
            steals.append(steal() - s0)
            if sk_ref is None:
                sk_ref = sk
            assert sk == sk_ref, f"{name}[{i}]: sketch {sk} != {sk_ref}"
            log(f"{name}[{i}] wall={walls[-1]}s steal={steals[-1]}")
        out["configs"][name] = {
            "walls": walls, "steal_jiffies": steals,
            "wall_sec": min(walls),
            "throughput": round(m / min(walls), 1),
        }
    out["speedup"] = round(
        out["configs"]["star_only"]["wall_sec"]
        / out["configs"]["pre_contract"]["wall_sec"], 2
    )
    path = os.path.join(REPO, "BENCH", "cc_contract_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
