"""Triangle counting via degree-ordered wedge closure (SURVEY.md §2.9 G8).

Non-iterative two-join pipeline (Suri & Vassilvitskii's MR-friendly
formulation): orient each undirected edge from the lower-(degree, id)
endpoint to the higher one, join oriented edges on the middle vertex to
form wedges, then semi-join wedges against the oriented edge set to keep
closed ones. Each triangle (a<b<c in the degree order) is produced
exactly once as wedge a→b→c closed by a→c.

The degree ordering bounds wedge fan-out by O(m^{1/2}) per vertex —
the hub-skew mitigation for this operator (a raw hub with degree d would
otherwise emit d² wedges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import degrees, vertices_of


def _oriented(edges: DataFrame, assume_canonical: bool = False) -> DataFrame:
    """Canonical undirected edges -> edges directed by (degree, id) order.

    ``assume_canonical`` skips the defensive least/greatest + distinct
    (one |E|-scale shuffle) when the caller guarantees the
    ``derive_edges`` output contract: src < dst, one row per unordered
    pair, no self-loops. A duplicate row passed under the flag would be
    counted as two parallel edges (wedges double)."""
    if assume_canonical:
        e = edges.select("src", "dst")
    else:
        e = (
            edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
            .distinct()
        )
    deg = degrees(e)
    ds = deg.select(F.col("id").alias("src"), F.struct(F.col("degree"), F.col("id")).alias("_ks"))
    dd = deg.select(F.col("id").alias("dst"), F.struct(F.col("degree"), F.col("id")).alias("_kd"))
    j = e.join(ds, "src").join(dd, "dst")
    return j.select(
        F.when(F.col("_ks") < F.col("_kd"), F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(F.col("_ks") < F.col("_kd"), F.col("dst")).otherwise(F.col("src")).alias("b"),
    )


def _closed_wedges_of(d: DataFrame) -> DataFrame:
    """Closed wedges over an already-materialized oriented table.

    ``d`` is referenced THREE times (both wedge legs + the closer), and
    ``_oriented`` itself consumes its input several more — so callers
    persist the oriented table first; with a lazy expensive edge input
    (a co-occurrence derivation) the unpinned plan would re-evaluate it
    per reference (the same multi-consumption cost the sketch operators
    eliminate; exchange reuse cannot help here because the three
    consumers shuffle on three different keys: b, a, and (a, c))."""
    e1 = d.select(F.col("a"), F.col("b"))
    e2 = d.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b")
    closer = d.select(F.col("a"), F.col("b").alias("c"))
    return wedges.join(closer, ["a", "c"], "left_semi").select("a", "b", "c")


def triangle_count(edges: DataFrame, assume_canonical: bool = False) -> int:
    """Total number of triangles in the undirected graph."""
    d = _oriented(edges, assume_canonical).persist()
    try:
        return _closed_wedges_of(d).count()
    finally:
        d.unpersist()


def triangles_per_vertex(
    edges: DataFrame, assume_canonical: bool = False
) -> DataFrame:
    """DataFrame[id, triangles] — per-vertex triangle participation
    (nx.triangles semantics; vertices in no triangle get 0)."""
    d = _oriented(edges, assume_canonical).persist()
    tri = _closed_wedges_of(d)
    # one reference to the wedge pipeline (a 3-way unionByName would
    # re-plan/recompute it three times)
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
    counts = corners.groupBy("id").agg(F.count(F.lit(1)).alias("triangles"))
    out = (
        vertices_of(edges)
        .join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )
    # pin the result once so the oriented cache can be released
    # immediately (same pattern as graph/cc.py:_decode_labels); the
    # checkpoint blocks are the caller's result set, LRU-evicted after
    # consumption
    out = out.localCheckpoint(eager=True)
    d.unpersist()
    return out
