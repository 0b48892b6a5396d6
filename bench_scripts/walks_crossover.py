"""Random-walk corpus physical-strategy crossover measurement.

Substantiates ``graph/walks.py::LOCAL_WALK_MAX_STEP_ROWS`` /
``LOCAL_WALK_MAX_ADJ_ROWS`` with data: measures the single-task replay
kernel against both distributed per-step-join strategies on identical
inputs across corpus scales.

Protocol mirrors bench_scripts/kcore_crossover.py: one fresh-JVM
subprocess per level, ``repeats`` runs per mode in that JVM, MINIMUM
wall as the noise-robust estimate (sandbox contention only ever
inflates). Graphs are deterministic uniform random with string vertex
keys, generated distributively (spark.range + xxhash64 — no driver
data), |V| = |E|/3; every vertex walks once (num_walks=1) at L=10, so
corpus cells = |V|·10 and directed adjacency rows = 2·|E_canonical|.
Modes are cross-checked by a (count, bit_xor) sketch over
(walk_id, seq) — exact agreement required (the walk corpus is
byte-identical across strategies by contract), so each level is also a
correctness probe far beyond pytest's sizes.

Results append to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from cryptowalletcommunitydetection_spark import build_session
from cryptowalletcommunitydetection_spark.graph.edges import canonicalize_edges
from cryptowalletcommunitydetection_spark.graph.walks import random_walks

cpus, E, L, repeats = {cpus}, {E}, {L}, {repeats}
V = max(E // 3, 4)
spark = build_session(app_name=f"walks-crossover-{{E}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=cpus)
raw = (spark.range(E)
       .select(F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(V))).alias("src"),
               F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(V))).alias("dst")))
edges = canonicalize_edges(raw).persist()
m = edges.count()

def steal():
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0

MODES = ["local", "broadcast", "shuffle"]

out = {{"E_raw": E, "E_canonical": m, "V": V, "L": L, "cpus": cpus, "modes": {{}}}}
sketches = {{}}
for name in MODES:
    walls, steals, nrows = [], [], None
    for _ in range(repeats):
        s0, t0 = steal(), time.monotonic()
        corpus = random_walks(edges, num_walks=1, walk_length=L, seed=7,
                              assume_canonical=True, strategy=name)
        r = corpus.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("walk_id", F.concat_ws(",", "seq"))).alias("h"),
        ).collect()[0]
        walls.append(time.monotonic() - t0)
        steals.append(steal() - s0)
        nrows = r["n"]
        sketches[name] = (r["n"], r["h"])
        corpus.unpersist()
    out["modes"][name] = {{
        "walls": [round(w, 2) for w in walls],
        "best_wall_sec": round(min(walls), 3),
        "steals": steals,
        "corpus_rows": nrows,
    }}
assert len(set(sketches.values())) == 1, f"corpora diverge: {{sketches}}"
out["corpora_agree"] = True
print("RESULT " + json.dumps(out))
"""


def run_level(E: int, L: int, cpus: int, repeats: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, E=E, L=L, repeats=repeats)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child E={E} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="300000,1200000,2400000,4800000")
    ap.add_argument("--walk-length", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    rows = []
    for E in (int(x) for x in args.levels.split(",")):
        r = run_level(E, args.walk_length, args.cpus, args.repeats)
        rows.append(r)
        print(json.dumps(r))

    lines = [
        "",
        "## Walk-corpus physical-strategy crossover — single-task replay kernel vs per-step joins",
        "",
        f"`bench_scripts/walks_crossover.py`, local[{args.cpus}], fresh JVM per level,",
        f"min of {args.repeats} repeats per mode (steal jiffies recorded), uniform",
        f"random string-keyed graphs (|V| = |E|/3), num_walks=1, L={args.walk_length}",
        "(corpus cells = |V|·L); (count, bit_xor) corpus sketches agree exactly at",
        "every level — the byte-identical-across-strategies contract, probed far",
        "beyond pytest's sizes.",
        "",
        "| raw E | canonical E | corpus cells | local (s) | broadcast (s) | shuffle (s) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lo = r["modes"]["local"]
        br = r["modes"]["broadcast"]
        sh = r["modes"]["shuffle"]
        cells = lo["corpus_rows"] * r["L"]
        lines.append(
            f"| {r['E_raw']:,} | {r['E_canonical']:,} | {cells:,}"
            f" | {lo['best_wall_sec']} {lo['walls']}"
            f" | {br['best_wall_sec']} {br['walls']}"
            f" | {sh['best_wall_sec']} {sh['walls']} |"
        )
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended {len(rows)} levels to {args.out}")


if __name__ == "__main__":
    main()
