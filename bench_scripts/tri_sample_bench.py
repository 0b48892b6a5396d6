"""DOULION sampled-triangle bench: exact distributed pipeline vs the
hash-coin sparsified estimate on a triangle-RICH graph above the
local-kernel gate.

The round-4 distributed-path graph (uniform random, 11M edges) holds
only 36 triangles — sampling variance there is maximal and the
estimator is pointless (p**3 * T << 1). DOULION's win condition is the
opposite regime — T large — which is also exactly when the exact
two-join pipeline is expensive (closed wedges ~ T rows flow through
the semi-join). So this bench uses a deterministic CLUSTERED graph:
C communities of K vertices, each internal pair kept with probability
q via a hash coin (spark.range decomposition, no driver data):

    C=200k, K=20, q=0.3  ->  ~11.4M canonical edges, ~6.2M triangles

Measured (min of REPEATS, steal recorded): the exact count forced
through the distributed two-join, then triangle_count_sampled at
p in {0.25, 0.1} (the sparsified graph falls under LOCAL_TRI_MAX_EDGES,
so the scale path additionally collapses to the single-task kernel —
the adaptive gate composing with the sampler is the point).

Appends a section to BENCH/BASELINE.md, writes BENCH/tri_sample.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

C = int(os.environ.get("TS_COMMUNITIES", 200_000))
K = int(os.environ.get("TS_COMMUNITY_SIZE", 20))
Q_MILLI = int(os.environ.get("TS_KEEP_MILLI", 300))  # q = Q_MILLI/1000
REPEATS = int(os.environ.get("TS_REPEATS", 2))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
PS = (0.25, 0.1)


def steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


def log(msg: str) -> None:
    print(f"[ts {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    from pyspark.sql import functions as F

    from cryptowalletcommunitydetection_spark import build_session
    from cryptowalletcommunitydetection_spark.graph.triangles import (
        LOCAL_TRI_MAX_EDGES,
        triangle_count,
        triangle_count_sampled,
    )

    spark = build_session(
        app_name="tri-sample-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )

    # community-clustered graph: id -> (community, i, j), keep i<j pairs
    # with a deterministic hash coin. Canonical by construction (each
    # unordered pair appears once, i<j => src<dst as int64, no loops).
    kk = K * K
    base = spark.range(C * kk)
    c = (F.col("id") / kk).cast("long")
    r = F.pmod(F.col("id"), F.lit(kk))
    i = (r / K).cast("long")
    j = F.pmod(r, F.lit(K))
    edges = (
        base.select(
            (c * K + i).alias("src"),
            (c * K + j).alias("dst"),
            F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)).alias("_coin"),
            i.alias("_i"),
            j.alias("_j"),
        )
        .filter((F.col("_i") < F.col("_j")) & (F.col("_coin") < Q_MILLI))
        .select("src", "dst")
        .persist()
    )
    m = edges.count()
    log(f"graph ready: canonical |E|={m:,} (C={C:,} x K={K}, q={Q_MILLI/1000})")
    assert m > LOCAL_TRI_MAX_EDGES, "graph must exceed the local gate"

    def best_of(fn):
        walls, steals, res = [], [], None
        for _ in range(REPEATS):
            s0, t0 = steal(), time.monotonic()
            res = fn()
            walls.append(round(time.monotonic() - t0, 3))
            steals.append(steal() - s0)
        return res, min(walls), walls, steals

    # exact, forced through the distributed two-join (what auto picks
    # here anyway: m > gate), edge_count supplied so no probe job
    t_exact, w_exact, walls_e, steals_e = best_of(
        lambda: triangle_count(
            edges, assume_canonical=True, local=False, edge_count=m
        )
    )
    log(f"exact: T={t_exact:,} wall={w_exact}s walls={walls_e} steal={steals_e}")

    rows = []
    for p in PS:
        (est, w_p, walls_p, steals_p) = best_of(
            lambda p=p: triangle_count_sampled(
                edges, p=p, assume_canonical=True
            )
        )
        err = abs(est - t_exact) / t_exact if t_exact else 0.0
        kept = int(round(m * p))
        rows.append(
            {
                "p": p,
                "estimate": est,
                "rel_err": round(err, 5),
                "wall_sec": w_p,
                "walls": walls_p,
                "steals": steals_p,
                "kept_edges_approx": kept,
                "local_kernel": kept <= LOCAL_TRI_MAX_EDGES,
                "speedup": round(w_exact / w_p, 2) if w_p else None,
            }
        )
        log(f"p={p}: est={est:,.0f} err={err:.4%} wall={w_p}s walls={walls_p}")

    out = {
        "C": C, "K": K, "q": Q_MILLI / 1000, "E_canonical": m,
        "cpus": CPUS, "repeats": REPEATS,
        "exact": {
            "triangles": t_exact, "wall_sec": w_exact,
            "walls": walls_e, "steals": steals_e,
        },
        "sampled": rows,
    }
    path = os.path.join(REPO, "BENCH", "tri_sample.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")

    md = [
        "",
        "## DOULION sampled triangles — exact distributed vs hash-coin sparsified"
        f" (clustered graph, |E|={m:,}, local[{CPUS}])",
        "",
        "`bench_scripts/tri_sample_bench.py`: C=%s communities x K=%d," % (f"{C:,}", K),
        f"internal pair keep-prob q={Q_MILLI/1000} (deterministic xxhash64 coin"
        " — same",
        "sparsifier the estimator itself uses), min of"
        f" {REPEATS} repeats, steal recorded.",
        f"Exact count forced through the distributed two-join: "
        f"**T={t_exact:,} in {w_exact}s**.",
        "",
        "| p | estimate | rel. error | wall (s) | speedup | kernel |",
        "|---|---|---|---|---|---|",
    ]
    for rw in rows:
        md.append(
            "| {p} | {estimate:,.0f} | {rel_err:.3%} | {wall_sec} | {speedup}x"
            " | {kern} |".format(
                kern="local (under 2M gate)" if rw["local_kernel"] else "distributed",
                **rw,
            )
        )
    md += [
        "",
        "Reading: on triangle-rich graphs — the regime where the exact",
        "pipeline is expensive, since ~T closed wedges flow through the",
        "semi-join — the p**3-scaled estimate concentrates (rel. std ~",
        "1/sqrt(p^3 T)) while the wedge join shrinks ~p^2; at p=0.1 the",
        "sparsified edge set additionally falls under LOCAL_TRI_MAX_EDGES",
        "and the adaptive gate collapses the whole job to the single-task",
        "kernel. The sampler composes with the existing physical-strategy",
        "selection rather than bypassing it. Uniform-random graphs (36",
        "triangles at 11M edges, distributed_r04.json) are the estimator's",
        "WORST case and stay on the exact path.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(md))
    log("appended BENCH/BASELINE.md section")
    spark.stop()


if __name__ == "__main__":
    main()
