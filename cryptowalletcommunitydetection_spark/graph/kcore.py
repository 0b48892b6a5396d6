"""k-core decomposition (coreness) via distributed H-index fixpoint.

North-rule extension of the reference's wallet-clustering workload
(SURVEY.md §2.9): the reference prunes weakly-attached wallets before
clustering (e.g. the LP-balance threshold filter,
`jobs/dex_wallets/lp_traders_job.py:15,70` keeps only wallets above a
significance cut); k-core is the graph-native form of that cut — keep
the maximal subgraph where every wallet retains >= k links.

Algorithm (Lu, Zhang, Zhou, Stanley 2016): initialize c_0(v) = deg(v)
and iterate

    c_{k+1}(v) = H({ c_k(u) : u in N(v) })

where H is the H-index (the largest h such that at least h neighbors
have value >= h). The sequence is elementwise monotone nonincreasing
and its fixpoint is exactly the coreness of every vertex, so the loop
terminates (integer state, bounded below by 0) and the converged state
equals ``nx.core_number``. Convergence is typically a few supersteps
(it needs only as many rounds as the longest strictly-decreasing
dependency chain), far fewer than the |V| sequential peels of the
classic Batagelj-Zaversnik algorithm — which cannot be distributed,
while each H-index superstep is two shuffles of DataFrame built-ins.

Scale design (same physical-strategy playbook as PageRank/CC/LPA):
- the per-superstep message stream is compacted to a per-vertex VALUE
  HISTOGRAM first — ``groupBy(dst, value).count()`` gets map-side
  partial aggregation, so the shuffle moves one row per (vertex,
  distinct neighbor value), not one per edge; hub vertices with 10^6
  neighbors but few distinct neighbor values cost that few rows,
- the H-index is then a window over the (small) histogram: order values
  descending, h = max(min(value, cumulative_count)) — never a sort of
  the raw edge-scale message stream,
- below ``LOCAL_KCORE_MAX_EDGES`` the whole loop runs as ONE vectorized
  numpy task (the broadcast-join principle applied to the iteration;
  same gate rationale as graph/pagerank.py LOCAL_PR_MAX_EDGES),
- supersteps checkpoint state + metrics through the same RunManifest
  as PageRank/CC/LPA, so a run is resumable and its convergence
  trajectory observable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..plans.checkpoint import RunManifest
from .edges import canonicalize_edges, symmetrize

LOCAL_KCORE_MAX_EDGES = 4_000_000
"""Size gate (canonical undirected edge rows) below which the H-index
loop runs as a single vectorized numpy task. MEASURED crossover
(bench_scripts/kcore_crossover.py, local[32], fresh-JVM min-of-2,
uniform random string-keyed graphs): local wins 5.2x at 1M raw rows,
1.8x at 2M, 1.4x at 4M, and LOSES 0.78x at 8M — the gate sits at the
last measured local win. Integer state in both paths, so
local/distributed parity is exact (tested; the crossover script also
sketch-checks agreement at every level). ``run_dir`` checkpointing
always uses the distributed loop."""


@dataclass
class CoreResult:
    cores: DataFrame  # [id, core]
    supersteps: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _local_core_numbers(canon: DataFrame, max_iter: int) -> CoreResult:
    """Single-task vectorized H-index iteration over the (small)
    canonical edge set.

    Per iteration everything is numpy over the symmetrized edge arrays:
    one lexsort groups (vertex, neighbor-value desc), ranks come from
    group-head subtraction, candidates ``min(value, rank)`` reduce per
    group with ``np.maximum.reduceat`` — the vectorized twin of the
    histogram + window in the distributed superstep. Per-row Python
    never touches edge data. Terminates at the exact coreness fixpoint
    (monotone nonincreasing integer state)."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType, IntegerType, LongType, StructField, StructType,
    )

    id_type = canon.schema["src"].dataType
    out_schema = StructType([
        StructField("id", id_type),
        StructField("core", LongType()),
        StructField("_k", IntegerType()),
        StructField("_conv", BooleanType()),
    ])

    def kernel(batches):
        import numpy as np

        srcs, dsts = [], []
        for pdf in batches:
            srcs.append(pdf["src"].to_numpy())
            dsts.append(pdf["dst"].to_numpy())
        m = sum(len(a) for a in srcs)
        if m == 0:
            yield pd.DataFrame({"id": [], "core": [], "_k": [], "_conv": []}).astype(
                {"core": "int64", "_k": "int32", "_conv": "bool"}
            )
            return
        all_keys = np.concatenate(srcs + dsts)
        if all_keys.dtype == object:
            # factorize + sorted-unique reindex (C memcmp path), same as
            # the LPA kernel — sorted order only for run determinism;
            # coreness itself is order-free
            codes, uniques = pd.factorize(all_keys)
            order_u = np.argsort(uniques)
            pos = np.empty(len(order_u), dtype=np.int64)
            pos[order_u] = np.arange(len(order_u))
            inv = pos[codes]
            ids = uniques[order_u]
        else:
            ids, inv = np.unique(all_keys, return_inverse=True)
        nn = len(ids)
        src_i, dst_i = inv[:m], inv[m:]
        # symmetrized directed arrays: H-index gathers over in-neighbors
        s = np.concatenate([src_i, dst_i])
        t = np.concatenate([dst_i, src_i])
        c = np.bincount(t, minlength=nn).astype(np.int64)  # c_0 = degree

        steps, converged = 0, False
        for k in range(max_iter):
            vals = c[s]
            o = np.lexsort((-vals, t))
            tt, vv = t[o], vals[o]
            head = np.ones(len(o), dtype=bool)
            head[1:] = tt[1:] != tt[:-1]
            starts = np.flatnonzero(head)
            gid = np.cumsum(head) - 1
            rank = np.arange(len(o), dtype=np.int64) - starts[gid] + 1
            cand = np.minimum(vv, rank)
            h = np.maximum.reduceat(cand, starts)
            # tt groups appear in ascending vertex code; every code has
            # degree >= 1 post-canonicalization, so h aligns with 0..nn-1
            new_c = np.minimum(c, h)
            changed = int((new_c != c).sum())
            c = new_c
            steps = k + 1
            if changed == 0:
                converged = True
                break
        yield pd.DataFrame({
            "id": ids,
            "core": c,
            "_k": np.int32(steps),
            "_conv": converged,
        })

    out = canon.select("src", "dst").coalesce(1).mapInPandas(kernel, out_schema)
    out = out.localCheckpoint(eager=True)
    meta = out.select(F.max("_k").alias("k"), F.min("_conv").alias("c")).collect()[0]
    return CoreResult(
        out.select("id", "core"),
        int(meta["k"] or 0),
        bool(meta["c"]) if meta["c"] is not None else True,
    )


def core_numbers(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 200,
    run_dir: str | None = None,
    local: bool | None = None,
    assume_canonical: bool = False,
) -> CoreResult:
    """DataFrame[id, core] — the coreness of every vertex
    (``nx.core_number`` semantics; self-loops dropped, duplicate rows /
    orientations collapse to one undirected edge, weights ignored).

    ``assume_canonical``: caller guarantees src < dst, one row per
    unordered pair, no self-loops (the ``derive_edges`` contract) — the
    defensive ``canonicalize_edges`` shuffle is skipped. A contract,
    not a hint: duplicate orientations would inflate degrees.

    ``local``: ``None`` auto-selects the single-task vectorized kernel
    below ``LOCAL_KCORE_MAX_EDGES`` when no ``run_dir`` is requested;
    ``False`` forces the distributed loop; ``True`` forces local.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` supersteps (unlike LPA's legitimate 2-cycles, a capped
    H-index run has NOT computed coreness — the monotone state is
    merely an upper bound). With ``run_dir`` the state up to the cap is
    checkpointed, so a rerun with a higher ``max_iter`` resumes instead
    of restarting.
    """
    if assume_canonical:
        canon = edges.select("src", "dst")
    else:
        canon = canonicalize_edges(edges).select("src", "dst")
    canon = canon.persist(StorageLevel.MEMORY_AND_DISK)

    if run_dir is None and local is not False:
        m = canon.count()  # also materializes the persist for either path
        if local is True or m <= LOCAL_KCORE_MAX_EDGES:
            res = _local_core_numbers(canon, max_iter)
            canon.unpersist()
            return res

    # partitioned AND sorted on the per-round join key: an un-laid-out
    # cache re-exchanges + re-sorts all 2|E| rows in every round's
    # sort-merge join (graph/hits.py layout measurement; LPA/kcore
    # numbers in BENCH/BASELINE.md)
    e = (
        symmetrize(canon, weight=False)
        .repartition("src").sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cores = (
        e.groupBy(F.col("dst").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("core"))
    )

    manifest = None
    start_k = 0
    if run_dir is not None:
        # input identity: coreness is a function of the distinct
        # canonical edge set only — (count, bit_xor) over it cannot
        # suffer duplicate-row XOR cancellation (the set is deduped)
        sk = canon.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).collect()[0]
        params = {"input_rows": sk["n"], "input_hash": sk["h"]}
        manifest = RunManifest.open_or_create(run_dir, "kcore", params)
        last = manifest.last_complete()
        if last >= 0:
            cores = manifest.load_state(spark, last).select("id", "core")
            start_k = last + 1
            if any(
                s["k"] == last and s.get("delta") == 0
                for s in manifest.supersteps
            ):
                canon.unpersist()
                e.unpersist()
                return CoreResult(cores, last + 1, True, manifest.metrics())
    cores = cores.localCheckpoint(eager=True) if manifest is None else cores

    converged = False
    steps = start_k
    local_metrics: list[dict] = []
    prev_ckpt = cores if manifest is None else None
    # histogram rows per vertex = distinct neighbor values (<= degree,
    # typically tiny); window sorts only that compacted stream
    wcum = (
        Window.partitionBy("dst")
        .orderBy(F.col("_cv").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for k in range(start_k, max_iter):
        t0 = time.monotonic()
        nbr = e.join(cores, e.src == cores.id).select(
            F.col("dst"), F.col("core").alias("_cv")
        )
        hist = nbr.groupBy("dst", "_cv").agg(F.count(F.lit(1)).alias("_n"))
        h = (
            hist.select(
                "dst", F.least(F.col("_cv"), F.sum("_n").over(wcum)).alias("_hh")
            )
            .groupBy("dst")
            .agg(F.max("_hh").alias("_h"))
            .select(F.col("dst").alias("id"), "_h")
        )
        new_cores = cores.join(h, "id", "left").select(
            "id",
            # every vertex has degree >= 1, but a checkpoint-resumed
            # state may carry ids the join misses only if the edge table
            # changed — least(old, coalesce(h, old)) keeps monotonicity
            F.least(F.col("core"), F.coalesce("_h", F.col("core"))).alias("core"),
            F.col("core").alias("_old"),
        )
        if manifest is not None:
            new_cores = manifest.checkpoint(new_cores, k)
        else:
            new_cores = new_cores.localCheckpoint(eager=False)
        agg_row = new_cores.agg(
            F.sum((F.col("core") != F.col("_old")).cast("long")).alias("_chg"),
            F.count(F.lit(1)).alias("_n"),
        ).collect()[0]
        changed = int(agg_row["_chg"] or 0)
        wall_ms = (time.monotonic() - t0) * 1e3
        local_metrics.append({"k": k, "wall_ms": wall_ms, "delta": changed})
        if manifest is not None:
            manifest.record_superstep(
                spark, k, wall_ms=wall_ms, delta=changed, rows=agg_row["_n"]
            )
        if prev_ckpt is not None and manifest is None:
            prev_ckpt.unpersist()
        prev_ckpt = new_cores
        cores = new_cores.select("id", "core")
        steps = k + 1
        if changed == 0:
            converged = True
            break

    canon.unpersist()
    e.unpersist()
    if not converged:
        raise RuntimeError(
            f"k-core H-index iteration did not reach its fixpoint within "
            f"max_iter={max_iter} supersteps — the state is an upper bound "
            f"on coreness, not coreness. Re-run with a higher max_iter"
            + (" (the run_dir manifest resumes from the cap)." if run_dir
               else " or pass run_dir to make the run resumable.")
        )
    metrics = manifest.metrics() if manifest is not None else local_metrics
    return CoreResult(cores, steps, converged, metrics)


def k_core(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    assume_canonical: bool = False,
    **kwargs,
) -> DataFrame:
    """Canonical edges of the k-core subgraph (``nx.k_core(G, k)``):
    both endpoints have coreness >= k. Weight columns pass through."""
    res = core_numbers(
        spark, edges, assume_canonical=assume_canonical, **kwargs
    )
    if assume_canonical:
        canon = edges
    else:
        has_w = "weight" in edges.columns
        canon = canonicalize_edges(edges, weight="weight" if has_w else None)
    keep = res.cores.filter(F.col("core") >= k).select("id")
    out_cols = [c for c in canon.columns if c in ("src", "dst", "weight")]
    return (
        canon.join(keep.withColumnRenamed("id", "src"), "src", "semi")
        .join(keep.withColumnRenamed("id", "dst"), "dst", "semi")
        .select(*out_cols)
    )


def degeneracy(spark: SparkSession, edges: DataFrame, **kwargs) -> int:
    """max coreness (the graph's degeneracy); 0 for an empty graph."""
    res = core_numbers(spark, edges, **kwargs)
    row = res.cores.agg(F.max("core").alias("m")).collect()[0]
    return int(row["m"] or 0)
