"""Connected components via alternating large-star / small-star.

DataFrame-only rebuild of the reference's clustering core —
``nx.connected_components`` at services/wallet_clustering.py:15, which
materializes the whole graph in driver memory. Here the algorithm is
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC
2014): O(log n) rounds of two join+groupBy passes, each expressible as
pure DataFrame ops, converging to star graphs rooted at each component's
minimum vertex id. Component id = min member (deterministic; the
reference's uuid4 group ids at services/wallet_clustering.py:33 are
replaced per SURVEY.md §7).

Scale notes: per round the state is at most one edge per vertex after
the first small-star, so the shuffled volume shrinks toward |V|;
convergence test is a distributed symmetric-difference count (driver
sees a scalar); every round is checkpointed to Parquet (lineage cut +
resume).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.checkpoint import RunManifest


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every neighbor v > u to min(N(u) ∪ {u})."""
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least(F.col("_mn"), F.col("u")).alias("m"))
    out = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    # no distinct here: _small_star re-orients and distincts first thing,
    # so a dedup at this point would just add a shuffle per round
    return out


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges (larger, smaller); connect u and all smaller neighbors
    to the minimum neighbor. Output canonically oriented src > dst."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    ).distinct()
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    selfs = mins.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return (
        nbrs.unionByName(selfs)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _edge_sketch(df: DataFrame):
    """(rows, xxhash64-sum) of a distinct edge set — one agg job.

    Equal sketches ⟹ equal sets except with ~2^-64 collision
    probability; used as the cheap per-round fixpoint probe, always
    confirmed by an exact one-sided except before declaring convergence."""
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-independent and overflow-free under ANSI mode
        # (a sum of xxhash64 longs overflows); distinct sets, so no
        # pair-cancellation concern
        F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
    ).collect()[0]
    return r["n"], r["h"]


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    run_dir: str | None = None,
    strict: bool = True,
    encode: bool | None = None,
) -> DataFrame:
    """DataFrame[id, component] with component = min member id.

    ``edges`` needs columns src, dst (any orderable type; self-loops and
    duplicate orientations tolerated). ``vertices`` (DataFrame[id])
    optionally adds isolated vertices (own singleton components).
    ``run_dir`` enables per-round Parquet checkpoints + manifest; a rerun
    with the same run_dir resumes from the last complete round.

    ``encode`` re-keys string vertices to int64 (xxhash64, seed 42) for
    the iterative loop — every per-round shuffle then moves and compares
    fixed-width longs instead of variable-length strings — and remaps
    the final labels back so ``component`` is the min ORIGINAL key of
    each component (exact equality with the unencoded result). Default
    (None) auto-enables for string keys after a collision check; a
    detected collision (or ``encode=False``) keeps the original keys.
    Measured at sf0.1 (16.5k vertices, 44k edges): 5.5s -> ~3.5s.
    """
    from pyspark.sql.types import StringType

    raw = (
        edges.select("src", "dst")
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    vdict = None
    if encode is None:
        encode = isinstance(raw.schema["src"].dataType, StringType)
    if encode:
        keys = raw.select(F.col("src").alias("key")).unionByName(
            raw.select(F.col("dst").alias("key"))
        )
        if vertices is not None:
            keys = keys.unionByName(
                vertices.select(F.col("id").alias("key")).filter(
                    F.col("id").isNotNull()
                )
            )
        vdict = (
            keys.distinct()
            .select(F.xxhash64(F.col("key"), F.lit(42)).alias("vid"), "key")
            .persist()
        )
        chk = vdict.agg(
            F.count(F.lit(1)).alias("nk"), F.countDistinct("vid").alias("nv")
        ).collect()[0]
        if chk["nk"] != chk["nv"]:
            # a 64-bit collision among the vertex keys: labels in vid
            # space would silently merge distinct vertices — fall back
            # to the original keys (algorithms are key-type agnostic)
            vdict.unpersist()
            vdict = None
            encode = False
    if encode:
        raw = raw.select(
            F.xxhash64(F.col("src"), F.lit(42)).alias("src"),
            F.xxhash64(F.col("dst"), F.lit(42)).alias("dst"),
        )
        if vertices is not None:
            vertices = vertices.filter(F.col("id").isNotNull()).select(
                F.xxhash64(F.col("id"), F.lit(42)).alias("id")
            )
    e = raw.filter(F.col("src") != F.col("dst")).distinct()

    manifest = None
    start_k = 0
    input_sketch = None
    if run_dir is not None:
        # the manifest keys on the INPUT identity too — resuming a run_dir
        # against a different edge table must start fresh, not serve the
        # previous input's converged stars
        input_sketch = _edge_sketch(e)
        manifest = RunManifest.open_or_create(
            run_dir, "cc",
            {
                "input_rows": input_sketch[0],
                "input_hash": input_sketch[1],
                "encoded": encode,
            },
        )
        last = manifest.last_complete()
        if last >= 0:
            e = manifest.load_state(spark, last)
            start_k = last + 1
            done = [s for s in manifest.supersteps if s["k"] == last and s.get("delta") == 0]
            if done:
                return _decode_labels(
                    _labels_from_stars(spark, e, raw, vertices), vdict
                )

    prev = e.localCheckpoint(eager=True) if manifest is None else e
    prev_sketch = input_sketch if start_k == 0 and input_sketch else _edge_sketch(prev)

    delta = None
    for k in range(start_k, max_iter):
        t0 = time.monotonic()
        stepped = _small_star(_large_star(prev))
        if manifest is not None:
            stepped = manifest.checkpoint(stepped, k)
        else:
            stepped = stepped.localCheckpoint(eager=False)
        sketch = _edge_sketch(stepped)  # materializes the checkpoint
        rows = sketch[0]
        if sketch == prev_sketch:
            # probable fixpoint — confirm exactly (equal counts + empty
            # one-sided except ⟺ equal distinct sets)
            delta = stepped.exceptAll(prev).count()
        else:
            # changed round: the exact symmetric difference is not
            # computed (it would double the per-round work); record None
            # ("unchecked") rather than a fake count — resume only needs
            # delta == 0
            delta = None
        prev_sketch = sketch
        if manifest is not None:
            manifest.record_superstep(
                spark, k, wall_ms=(time.monotonic() - t0) * 1e3, delta=delta, rows=rows
            )
        # release the superseded round's pinned state (the new round is
        # materialized and no longer depends on it)
        if manifest is None:
            prev.unpersist()
        prev = stepped
        if delta == 0:
            break

    if delta != 0 and strict:
        # the star set did not reach its fixpoint — labels derived from
        # it could be duplicated/inconsistent; never return them
        # silently. strict=False opts into the best-effort labels (e.g.
        # a deliberately capped partial run that will be resumed later
        # via run_dir).
        raise RuntimeError(
            f"connected_components did not converge within max_iter "
            f"({max_iter}); raise max_iter (resume supported via run_dir) "
            f"or pass strict=False for best-effort labels"
        )
    return _decode_labels(_labels_from_stars(spark, prev, raw, vertices), vdict)


def _labels_from_stars(
    spark: SparkSession,
    stars: DataFrame,
    original_edges: DataFrame,
    vertices: DataFrame | None,
) -> DataFrame:
    """Star edges (v, root) -> (id, component); roots + isolated = self."""
    members = stars.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    all_vertices = (
        original_edges.select(F.col("src").alias("id"))
        .unionByName(original_edges.select(F.col("dst").alias("id")))
    )
    if vertices is not None:
        all_vertices = all_vertices.unionByName(vertices.select("id"))
    all_vertices = all_vertices.distinct()
    labeled = all_vertices.join(members, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    return labeled


def _decode_labels(labels: DataFrame, vdict: DataFrame | None) -> DataFrame:
    """Map vid-space labels back to original keys. The component label
    becomes the min ORIGINAL key over the component's members — bitwise
    equal to what the unencoded run produces (component membership sets
    are identical; only the representative changes under re-keying)."""
    if vdict is None:
        return labels
    # j feeds both the group-min and the final join — persist so the
    # labels⋈dict join runs once, released below with the dict
    j = labels.join(vdict, labels.id == vdict.vid).select("key", "component").persist()
    comp_min = j.groupBy("component").agg(F.min("key").alias("_ck"))
    out = j.join(comp_min, "component").select(
        F.col("key").alias("id"), F.col("_ck").alias("component")
    )
    # pin the decoded result once so the persisted dict can be released
    # immediately (no cached-plan accumulation across calls); the
    # checkpoint blocks are the caller's result set and fall out of the
    # executor store via LRU after consumption
    out = out.localCheckpoint(eager=True)
    j.unpersist()
    vdict.unpersist()
    return out
