"""LPA physical-strategy crossover measurement.

Round 3 set ``graph/lpa.py::LOCAL_LPA_MAX_EDGES`` (4M deduped directed
vote rows) by ANALOGY with the measured PageRank/CC/k-core/triangle
gates; this script substantiates it with data: the single-task
vectorized numpy kernel vs the distributed vote-superstep loop on
identical inputs across edge scales, 4 fixed supersteps each.

Protocol mirrors bench_scripts/kcore_crossover.py: one fresh-JVM
subprocess per edge level, ``repeats`` runs per mode in that JVM,
MINIMUM wall as the noise-robust estimate (sandbox contention only
ever inflates). Graphs are deterministic uniform random with string
vertex keys, generated distributively (spark.range + xxhash64 — no
driver data), |V| = |E|/3. Modes are cross-checked by a
(count, bit_xor) sketch over (id, label) — exact agreement required
(label parity between paths is exact for unit weights, the tested
contract), so each level is also a correctness probe beyond pytest's
sizes.

Note the gate counts NORMALIZED vote rows (~2x canonical for an
undirected graph), so raw-E levels of 1M/2M/4M probe the gate at
~2M/4M/8M vote rows.

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
from cryptowalletcommunitydetection_spark.graph.lpa import label_propagation

cpus, E, repeats, steps = {cpus}, {E}, {repeats}, {steps}
V = max(E // 3, 4)
spark = build_session(app_name=f"lpa-crossover-{{E}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=cpus)
edges = (spark.range(E)
         .select(F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(V))).alias("src"),
                 F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(V))).alias("dst"))
         .persist())
edges.count()

MODES = {{"local-kernel": dict(local=True), "dist-superstep": dict(local=False)}}

out = {{"E_raw": E, "V": V, "cpus": cpus, "supersteps": steps, "modes": {{}}}}
sketches = {{}}
for name, kw in MODES.items():
    walls = []
    for _ in range(repeats):
        t0 = time.monotonic()
        res = label_propagation(spark, edges, max_iter=steps, **kw)
        r = res.labels.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("id", "label")).alias("h"),
        ).collect()[0]
        walls.append(time.monotonic() - t0)
        sketches[name] = (r["n"], r["h"])
        res.labels.unpersist()
    out["modes"][name] = {{
        "walls": [round(w, 2) for w in walls],
        "best_wall_sec": round(min(walls), 3),
    }}
assert len(set(sketches.values())) == 1, f"label sets diverge: {{sketches}}"
out["n_vertices"] = sketches["local-kernel"][0]
out["labels_agree"] = True
print("RESULT " + json.dumps(out))
"""


def run_level(E: int, cpus: int, repeats: int, steps: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, E=E, repeats=repeats, steps=steps)
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
    ap.add_argument("--levels", default="1000000,2000000,4000000,8000000")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    rows = []
    for E in (int(x) for x in args.levels.split(",")):
        r = run_level(E, args.cpus, args.repeats, args.steps)
        rows.append(r)
        print(json.dumps(r))

    lines = [
        "",
        "## LPA physical-strategy crossover — local vectorized kernel vs distributed vote loop",
        "",
        f"`bench_scripts/lpa_crossover.py`, local[{args.cpus}], fresh JVM per level,",
        f"min of {args.repeats} repeats per mode, {args.steps} fixed supersteps,",
        "uniform random string-keyed graphs (|V| = |E|/3); (count, bit_xor)",
        "label sketches agree exactly at every level. The gate counts",
        "NORMALIZED vote rows (~2x canonical), so these raw-E levels probe",
        "it at ~2x the first column.",
        "",
        "| raw edge rows | vertices | local kernel (s) | distributed loop (s) |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lo = r["modes"]["local-kernel"]
        hi = r["modes"]["dist-superstep"]
        lines.append(
            f"| {r['E_raw']:,} | {r['n_vertices']:,} | {lo['best_wall_sec']}"
            f" {lo['walls']} | {hi['best_wall_sec']} {hi['walls']} |"
        )
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended {len(rows)} levels to {args.out}")


if __name__ == "__main__":
    main()
