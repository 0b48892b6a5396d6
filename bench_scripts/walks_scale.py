"""Round-4: measure the walk-corpus operators ABOVE the broadcast gate
(the same graph-and-protocol as bench_scripts/distributed_paths.py).

The sf0.1 headline `walks` line is a 96k-walker broadcast-strategy run;
at corpus scale (W walks x |V| starts) the frontier exceeds
BROADCAST_FRONTIER_MAX_ROWS and the shuffle-strategy path is what 100x
scale would execute. This script measures, on the 11M-edge string-key
graph every other distributed path was measured on:

  1. full-corpus DeepWalk (W=1, all |V| vertices start) — frontier
     ~3.7M rows, auto picks SHUFFLE (asserted);
  2. seed-set DeepWalk (200k walkers) — auto picks BROADCAST
     (asserted), the frontier regime of seeded analyses;
  3. seed-set node2vec (p=0.5, q=2.0, 200k walkers) — the rejection
     round's three-job superstep (propose fan-out, membership join,
     min_by pick) at scale.

Min of REPEATS walls per line (steal inflates, never deflates);
throughput = emitted walk steps / wall. Appends a section to
BENCH/BASELINE.md and writes BENCH/walks_scale_r04.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

E_RAW = int(os.environ.get("WS_E_RAW", 11_000_000))
REPEATS = int(os.environ.get("WS_REPEATS", 2))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
L = 5
SEEDS = 200_000


def steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


def log(msg: str) -> None:
    print(f"[ws {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    from pyspark.sql import functions as F

    from cryptowalletcommunitydetection_spark import build_session
    from cryptowalletcommunitydetection_spark.graph.edges import canonicalize_edges
    from cryptowalletcommunitydetection_spark.graph.walks import (
        BROADCAST_FRONTIER_MAX_ROWS,
        node2vec_walks,
        random_walks,
    )

    spark = build_session(
        app_name="walks-scale-r04",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    V = E_RAW // 3
    raw = (
        spark.range(E_RAW)
        .select(
            F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(V))).alias("src"),
            F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(V))).alias("dst"),
        )
    )
    canon = canonicalize_edges(raw).persist()
    m = canon.count()
    log(f"graph ready: canonical={m:,} V~{V:,}")
    seeds = (
        canon.select(F.col("src").alias("id")).distinct()
        .orderBy("id").limit(SEEDS).persist()
    )
    n_seeds = seeds.count()

    out: dict = {
        "E_canonical": m,
        "V": V,
        "cpus": CPUS,
        "repeats": REPEATS,
        "walk_length": L,
        "broadcast_gate_rows": BROADCAST_FRONTIER_MAX_ROWS,
        "ops": {},
    }

    def run(name, fn, walkers):
        walls, steals = [], []
        n = 0
        for _ in range(REPEATS):
            s0, t0 = steal(), time.monotonic()
            n = fn().count()
            walls.append(round(time.monotonic() - t0, 3))
            steals.append(steal() - s0)
        best = min(walls)
        out["ops"][name] = {
            "walkers": walkers,
            "corpus_rows": n,
            "walls": walls,
            "steal_jiffies": steals,
            "wall_sec": best,
            "steps_per_sec": round(walkers * (L - 1) / best, 1),
        }
        log(f"{name}: {walls} best={best}s "
            f"({out['ops'][name]['steps_per_sec']:,} steps/s)")

    assert V * 1 > BROADCAST_FRONTIER_MAX_ROWS  # full corpus -> shuffle
    run(
        "deepwalk_full_corpus_shuffle",
        lambda: random_walks(
            canon, num_walks=1, walk_length=L, seed=42, assume_canonical=True
        ),
        V,
    )
    assert n_seeds <= BROADCAST_FRONTIER_MAX_ROWS  # seed set -> broadcast
    run(
        "deepwalk_seeds_broadcast",
        lambda: random_walks(
            canon, num_walks=1, walk_length=L, seed=42,
            assume_canonical=True, starts=seeds,
        ),
        n_seeds,
    )
    run(
        "node2vec_seeds",
        lambda: node2vec_walks(
            canon, p=0.5, q=2.0, num_walks=1, walk_length=L, seed=42,
            assume_canonical=True, starts=seeds,
        ),
        n_seeds,
    )

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "walks_scale_r04.json"), "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        "",
        f"## Walk corpus at scale — {m:,} canonical edges, |V|~{V:,}, "
        f"local[{CPUS}], min of {REPEATS} repeats",
        "",
        f"Walk length {L}; throughput = emitted steps (walkers x {L - 1}) "
        "/ wall. The full-corpus frontier (~|V| rows) exceeds the "
        f"{BROADCAST_FRONTIER_MAX_ROWS:,}-row broadcast gate, so auto "
        "executes the shuffle strategy — the regime a 100x cluster corpus "
        "runs in; the seed-set lines execute the broadcast strategy. "
        "node2vec pays ~3 jobs/superstep (propose fan-out, membership "
        "join against the cached symmetric edge set, min_by pick).",
        "",
        "| op | walkers | corpus rows | walls (s) | best (s) | steps/s |",
        "|---|---|---|---|---|---|",
    ]
    for name, o in out["ops"].items():
        lines.append(
            f"| {name} | {o['walkers']:,} | {o['corpus_rows']:,} | "
            f"{o['walls']} | {o['wall_sec']} | {o['steps_per_sec']:,} |"
        )
    lines.append("")
    lines.append(
        "Steal jiffies per repeat: "
        + "; ".join(f"{k} {v['steal_jiffies']}" for k, v in out["ops"].items())
        + "."
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    log("done")


if __name__ == "__main__":
    main()
