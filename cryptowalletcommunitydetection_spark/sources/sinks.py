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
    joined: DataFrame,
    null_col: str,
    quarantine_path: str,
    mode: str = "overwrite",
    materialize: bool = True,
) -> DataFrame:
    """Split a left-join result: rows with ``null_col`` IS NULL are
    written to the quarantine table; the matched rows are returned.

    ``joined`` is persisted across the two branches so the quarantined
    and returned sets come from ONE evaluation of the plan (a mutating
    upstream source can't put a row in both or neither).

    ``materialize=True`` (default) pins the matched branch with an eager
    ``localCheckpoint`` and releases the persisted parent before
    returning — repeated per-window calls don't accumulate cached plans.
    Pass ``materialize=False`` when the matched branch is too large to
    pin (the returned frame then keeps the snapshot guarantee through
    the persisted parent, and the CALLER must ``.unpersist()`` it after
    consuming the result).

    Replay semantics: the default ``mode="overwrite"`` is idempotent for
    a fixed path. When quarantining per window, point each window at its
    own path (``.../window=<lo>``) — the same convention the incremental
    runner uses for its sinks; ``mode="append"`` onto one shared path
    double-counts on replay."""
    joined = joined.persist()
    missing = joined.filter(F.col(null_col).isNull())
    missing.write.mode(mode).parquet(quarantine_path)
    matched = joined.filter(F.col(null_col).isNotNull())
    if materialize:
        out = matched.localCheckpoint(eager=True)
        joined.unpersist()
        return out
    return matched
