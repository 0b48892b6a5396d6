"""PageRank physical-strategy crossover measurement.

Substantiates ``LOCAL_PR_MAX_EDGES`` in ``graph/pagerank.py`` with data:
below it a single-task vectorized power iteration replaces the
distributed superstep loop. This script measures both paths on
identical inputs across edge scales so the crossover is on record, and
cross-checks rank parity (max |Δ| over all vertices) — making it a
correctness probe at sizes the pytest suite doesn't reach.

Protocol mirrors bench_scripts/cc_crossover.py: one fresh-JVM
subprocess per edge level, ``repeats`` runs per mode in that JVM,
MINIMUM wall as the noise-robust estimate (sandbox contention only ever
inflates). Graphs are deterministic uniform random with string vertex
keys ('w<id>'), generated distributively (spark.range + xxhash64 — no
driver data), |V| = |E|/3, weighted, fixed 20 supersteps (tol=0) so
both modes do identical work.

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
from cryptowalletcommunitydetection_spark.graph.pagerank import pagerank

cpus, E, repeats, steps = {cpus}, {E}, {repeats}, 20
V = max(E // 3, 4)
spark = build_session(app_name=f"pr-crossover-{{E}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=cpus)
edges = (spark.range(E)
         .select(F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(V))).alias("src"),
                 F.concat(F.lit("w"), F.pmod(F.xxhash64("id", F.lit(2)), F.lit(V))).alias("dst"),
                 (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5)) + 1).alias("weight"))
         .persist())
edges.count()

MODES = {{
    "local": dict(strategy="local"),
    "dist-broadcast": dict(strategy="broadcast"),
    "dist-copartition": dict(strategy="copartition"),
}}

out = {{"E_raw": E, "V": V, "cpus": cpus, "modes": {{}}}}
ranks = {{}}
for name, kw in MODES.items():
    walls = []
    for _ in range(repeats):
        t0 = time.monotonic()
        res = pagerank(spark, edges, tol=0.0, max_iter=steps, weighted=True, **kw)
        # materialize + sketch in one agg (the local path is already
        # materialized; the distributed path's ranks are checkpointed)
        r = res.ranks.agg(
            F.count(F.lit(1)).alias("n"), F.sum("rank").alias("s")
        ).collect()[0]
        walls.append(time.monotonic() - t0)
        ranks[name] = res.ranks
        assert res.supersteps == steps
    out["modes"][name] = {{
        "walls": [round(w, 2) for w in walls],
        "best_wall_sec": round(min(walls), 3),
        "n": r["n"],
    }}
# parity: max |local - broadcast| over all vertices (one join+agg)
a, b = ranks["local"].alias("a"), ranks["dist-broadcast"].alias("b")
mx = (a.join(b, F.col("a.id") == F.col("b.id"), "full_outer")
      .agg(F.max(F.abs(F.coalesce(F.col("a.rank"), F.lit(0.0))
                       - F.coalesce(F.col("b.rank"), F.lit(0.0)))).alias("mx"))
      .collect()[0]["mx"])
out["max_abs_rank_diff"] = float(mx)
assert mx < 1e-9, mx
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
    ap.add_argument("--levels", default="100000,1000000,4000000,16000000")
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
        "## PageRank physical-strategy crossover — local power iteration vs distributed supersteps"
        f" (local[{args.cpus}], fresh JVM per edge level, min of {args.repeats} repeats)",
        "",
        "Uniform random weighted string-key graphs (|V| = |E|/3) generated",
        "distributively; wall = full `pagerank` call (normalization + 20",
        "fixed supersteps + result materialization). Rank parity verified",
        "per level: max |local − broadcast| over all vertices < 1e-9.",
        "Gate under test: `LOCAL_PR_MAX_EDGES` = 4M normalized rows (the",
        "local kernel auto-selected at or below; raw E here ≈ canonical,",
        "normalized rows = 2×canonical after symmetrization).",
        "",
        "| E raw | V | local (s) | dist-broadcast (s) | dist-copartition (s) | max |Δrank| |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        m = r["modes"]
        lines.append(
            f"| {r['E_raw']:,} | {r['V']:,} "
            f"| {m['local']['best_wall_sec']} {m['local']['walls']} "
            f"| {m['dist-broadcast']['best_wall_sec']} {m['dist-broadcast']['walls']} "
            f"| {m['dist-copartition']['best_wall_sec']} {m['dist-copartition']['walls']} "
            f"| {r['max_abs_rank_diff']:.2e} |"
        )
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
