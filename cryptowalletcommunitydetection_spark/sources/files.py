"""Sources (SURVEY.md §2.1 S1-S6).

``read_files`` is the engine's single input shim for the Iceberg-style
``files`` table: it prefers an Iceberg catalog table when the runtime
jars are present and falls back to partitioned Parquet with the
identical schema — callers never branch. Partition filters (repo bucket,
lang) push down in both paths.

``read_wallet_pairs_csv`` reads the reference's community-assignment
fixtures (data/*_wallets_pairs.csv, schema (index, x, y), consumed at
cli/export_transactions.py:22-36).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

WALLET_PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("index", T.LongType(), True),
        T.StructField("x", T.StringType(), True),
        T.StructField("y", T.StringType(), True),
    ]
)


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_files(spark: SparkSession, location: str) -> DataFrame:
    """Read the files table from an Iceberg table name or a Parquet path."""
    if "/" not in location and _iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.schema(FILES_SCHEMA).parquet(location)


def write_files(files: DataFrame, path: str, partition_by: tuple[str, ...] = ("lang",)) -> None:
    """Partitioned Parquet layout (Iceberg-compatible schema): lang (and
    optionally a repo bucket) as partition dirs so scans prune."""
    files.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def write_edges(
    edges: DataFrame, name: str, path: str | None = None,
    buckets: int = 32,
) -> None:
    """Canonical edge table as a bucketed layout (SURVEY.md §4): bucketed
    + sorted by ``src`` so repeated graph runs (out-degree aggregation,
    scatter joins on src) start from a pre-hash-partitioned scan with NO
    initial Exchange. On a 1000-executor cluster this is the difference
    between re-shuffling the 100 TB edge table once per job and never.

    Bucketing requires a catalog table (``saveAsTable``); pass ``path``
    to keep the data at an external location."""
    w = edges.write.mode("overwrite").bucketBy(buckets, "src").sortBy("src")
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_edges(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed edge table written by ``write_edges``. The scan
    reports HashPartitioning(src) to Catalyst, so src-keyed joins and
    aggregations skip their shuffle (asserted in tests/test_plan_audit)."""
    return spark.table(name)


def read_wallet_pairs_csv(spark: SparkSession, path: str) -> DataFrame:
    """S5 — reference fixture CSV -> DataFrame[from_address, to_address],
    addresses lowercased (F1 normalization, utils/utils.py:31-34)."""
    raw = spark.read.csv(path, header=True, schema=WALLET_PAIRS_SCHEMA)
    return raw.select(
        F.lower("x").alias("from_address"), F.lower("y").alias("to_address")
    )
