"""Round-5 control experiment: is this box's DRAM bandwidth the binding
constraint on local[8]->local[32] scaling efficiency? (ADVICE r4: the
sub-0.8 copartition pairs were ATTRIBUTED to DRAM saturation without a
control.)

Method: a Spark-free, embarrassingly parallel STREAM-triad-style kernel
(numpy ``a = b*s + c`` over arrays far larger than LLC; 24 bytes/elem
traffic) run by P independent OS processes, P in {1, 8, 32}. There is
no shuffle, no JVM, no serialization and no shared state — the ONLY
shared resource is the memory system. If aggregate bandwidth at P=32
is well under 4x the P=8 aggregate, then even a perfectly parallel
memory-bound workload cannot scale 8->32 at >=0.8 on this host, and
the engine's sub-0.8 shuffle-heavy pairs are host-bound, not
engine-serialization-bound.

Prints one JSON line and appends BENCH/membw_control_r05.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

N_ELEM = 20_000_000      # 160 MB per array, 3 arrays per worker
PASSES = 20
BYTES_PER_ELEM_PASS = 24  # read b, read c, write a (doubles)


def worker(q):
    import numpy as np

    b = np.full(N_ELEM, 1.000001)
    c = np.full(N_ELEM, 2.0)
    a = np.empty(N_ELEM)
    # warm pass (page faults)
    np.multiply(b, 1.5, out=a)
    a += c
    t0 = time.monotonic()
    for _ in range(PASSES):
        np.multiply(b, 1.5, out=a)
        a += c
    wall = time.monotonic() - t0
    q.put(N_ELEM * PASSES * BYTES_PER_ELEM_PASS * 2 / wall)  # 2 kernels/pass


def run(p: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(q,)) for _ in range(p)]
    for pr in procs:
        pr.start()
    rates = [q.get() for _ in procs]
    for pr in procs:
        pr.join()
    return sum(rates)


def main() -> None:
    out = {"n_elem": N_ELEM, "passes": PASSES, "workers": {}}
    for p in (1, 8, 32):
        bw = run(p)
        out["workers"][str(p)] = round(bw / 1e9, 2)  # GB/s aggregate
        print(f"P={p}: {bw / 1e9:.1f} GB/s aggregate", file=sys.stderr)
    agg8, agg32 = out["workers"]["8"], out["workers"]["32"]
    out["scaling_8_to_32"] = round(agg32 / agg8 / 4.0, 3)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "membw_control_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
