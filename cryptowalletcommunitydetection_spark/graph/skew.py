"""Skew handling for hub vertices (SURVEY.md §2.9 G9).

The reference is single-machine and has no skew concept; at cluster
scale a hub vertex (degree 10^6+) concentrates one join/agg partition.
Three tools here, composable with any of the graph operators:

1. AQE skew-join splitting is always on (session.py) — handles the join
   probe side automatically.
2. ``salted_join`` — explicit salting for a big⋈small equi-join where
   one key dominates: the big side derives a salt from another uniform
   column, the small side is replicated nsalt ways.
3. ``salted_collect`` — two-phase collect_list/collect_set for
   non-algebraic aggregations (map-side partial agg already neutralizes
   hub skew for sums/counts, but collect_* has no partial form: phase 1
   collects per (key, salt), phase 2 flattens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import degrees


def degree_histogram(edges: DataFrame, log_base: int = 10) -> DataFrame:
    """DataFrame[bucket, n_vertices, max_degree] — log-scale degree histogram.

    Drives the hub threshold decision: salt when the top bucket's
    max_degree × row width exceeds a healthy partition size.
    """
    deg = degrees(edges)
    return (
        deg.withColumn(
            # +1e-9 guards against floor(log10(1000)=2.999...97) -> 2
            "bucket",
            F.floor(F.log(float(log_base), F.col("degree").cast("double")) + F.lit(1e-9)),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vertices"), F.max("degree").alias("max_degree"))
        .orderBy("bucket")
    )


def hub_vertices(edges: DataFrame, threshold: int) -> DataFrame:
    """DataFrame[id, degree] of vertices with degree > threshold."""
    return degrees(edges).filter(F.col("degree") > threshold)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    nsalt: int,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed ``key``: salt big, replicate small.

    ``salt_from``: a big-side column whose hash spreads the hub's rows
    (e.g. the opposite endpoint of an edge); defaults to all non-key
    columns.

    ``how`` is restricted to the big-side-preserving joins: a right or
    full outer join would emit ``nsalt`` null-extended copies of every
    unmatched small-side row (it was replicated once per salt).
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "cross"):
        raise ValueError(
            f"salted_join supports big-side-preserving joins only, got how={how!r} "
            "(right/full outer would replicate unmatched small-side rows nsalt times)"
        )
    salt_cols = [salt_from] if salt_from else [c for c in big.columns if c != key]
    b = big.withColumn("_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(nsalt)))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(nsalt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_collect(
    df: DataFrame,
    key: str,
    value: str,
    nsalt: int,
    distinct: bool = False,
    sort: bool = True,
) -> DataFrame:
    """Two-phase collect_list/set: (key, salt) partial collect, then
    flatten per key. Output DataFrame[key, values array]."""
    salt = F.pmod(F.xxhash64(F.col(value).cast("string")), F.lit(nsalt))
    collect = F.collect_set(value) if distinct else F.collect_list(value)
    phase1 = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(
        collect.alias("_part")
    )
    merged = phase1.groupBy(key).agg(F.flatten(F.collect_list("_part")).alias("values"))
    if distinct:
        merged = merged.select(key, F.array_distinct("values").alias("values"))
    if sort:
        merged = merged.select(key, F.sort_array("values").alias("values"))
    return merged
