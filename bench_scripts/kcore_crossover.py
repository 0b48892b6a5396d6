"""k-core physical-strategy crossover measurement.

Substantiates ``graph/kcore.py::LOCAL_KCORE_MAX_EDGES`` (4M) with data
rather than analogy: measures the single-task vectorized H-index kernel
against the distributed histogram+window superstep loop on identical
inputs across edge scales.

Protocol mirrors bench_scripts/cc_crossover.py: one fresh-JVM
subprocess per edge level, ``repeats`` runs per mode in that JVM,
MINIMUM wall as the noise-robust estimate (sandbox contention only
ever inflates). Graphs are deterministic uniform random with string
vertex keys, generated distributively (spark.range + xxhash64 — no
driver data), |V| = |E|/3. Modes are cross-checked by a
(count, bit_xor) sketch over (id, core) — exact agreement required,
so each level is also a correctness probe beyond pytest's sizes.

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
from cryptowalletcommunitydetection_spark.graph.kcore import core_numbers

cpus, E, repeats = {cpus}, {E}, {repeats}
V = max(E // 3, 4)
spark = build_session(app_name=f"kcore-crossover-{{E}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=cpus)
edges = (spark.range(E)
         .select(F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(V))).alias("src"),
                 F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(V))).alias("dst"))
         .persist())
edges.count()

MODES = {{"local-hindex": dict(local=True), "dist-superstep": dict(local=False)}}

out = {{"E_raw": E, "V": V, "cpus": cpus, "modes": {{}}}}
sketches = {{}}
for name, kw in MODES.items():
    walls, steps = [], None
    for _ in range(repeats):
        t0 = time.monotonic()
        res = core_numbers(spark, edges, **kw)
        r = res.cores.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("id", "core")).alias("h"),
        ).collect()[0]
        walls.append(time.monotonic() - t0)
        steps = res.supersteps
        sketches[name] = (r["n"], r["h"])
        res.cores.unpersist()
    out["modes"][name] = {{
        "walls": [round(w, 2) for w in walls],
        "best_wall_sec": round(min(walls), 3),
        "supersteps": steps,
    }}
assert len(set(sketches.values())) == 1, f"core sets diverge: {{sketches}}"
out["n_vertices"] = sketches["local-hindex"][0]
out["cores_agree"] = True
print("RESULT " + json.dumps(out))
"""


def run_level(E: int, cpus: int, repeats: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, E=E, repeats=repeats)
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
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    rows = []
    for E in (int(x) for x in args.levels.split(",")):
        r = run_level(E, args.cpus, args.repeats)
        rows.append(r)
        print(json.dumps(r))

    lines = [
        "",
        "## k-core physical-strategy crossover — local vectorized H-index vs distributed superstep loop",
        "",
        f"`bench_scripts/kcore_crossover.py`, local[{args.cpus}], fresh JVM per level,",
        f"min of {args.repeats} repeats per mode, uniform random string-keyed graphs",
        "(|V| = |E|/3); (count, bit_xor) core-set sketches agree exactly at every level.",
        "",
        "| raw edge rows | vertices | local kernel (s) | distributed loop (s) | supersteps |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lo = r["modes"]["local-hindex"]
        hi = r["modes"]["dist-superstep"]
        lines.append(
            f"| {r['E_raw']:,} | {r['n_vertices']:,} | {lo['best_wall_sec']}"
            f" {lo['walls']} | {hi['best_wall_sec']} {hi['walls']} | {hi['supersteps']} |"
        )
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended {len(rows)} levels to {args.out}")


if __name__ == "__main__":
    main()
