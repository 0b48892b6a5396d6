"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship community-detection query on sf0.001 — the
  Spark rebuild of the reference's wallet-clustering pipeline
  (services/wallet_clustering.py:51-65): derive bipartite pairs, run
  connected components (small-star/large-star), roll up per-community
  user/deposit membership counts.
- ``queries()`` / ``oracle_sql()``: operator coverage per SURVEY.md §2,
  implemented in cryptowalletcommunitydetection_spark.entry_queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cryptowalletcommunitydetection_spark import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return EQ.q_community_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; iterative
    mapInPandas/sketch ops are intentionally absent (rows-only check)."""
    return dict(EQ.ORACLES)
