"""Sinks (SURVEY.md §2.1 S9-S11).

- ``write_groups``: the community-rollup output table (the reference's
  Mongo `groups` collection, databases/mongodb.py:259-275) as Parquet.
- ``quarantine_sink``: the dead-letter side output — the reference
  appends missing transactions to a text file
  (jobs/dex_wallets/lp_deployers_job.py:43,84-90); here the null-branch
  of a left join is written to a quarantine Parquet path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_groups(groups: DataFrame, path: str, mode: str = "overwrite") -> None:
    groups.write.mode(mode).parquet(path)


def quarantine_sink(
    joined: DataFrame, null_col: str, quarantine_path: str
) -> DataFrame:
    """Split a left-join result: rows with ``null_col`` IS NULL are
    appended to the quarantine table; the matched rows are returned."""
    missing = joined.filter(F.col(null_col).isNull())
    missing.write.mode("append").parquet(quarantine_path)
    return joined.filter(F.col(null_col).isNotNull())
