"""Relational operator surface (SURVEY.md §2.2-2.6).

The reference hand-rolls these over Mongo cursors and Python dicts; here
each is a declarative DataFrame expression Catalyst can push down,
prune, and broadcast. Reference citations inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def semi_join(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """J2 — membership filter (`to_address IN hot_wallets`,
    databases/blockchain_etl.py:56-66). Broadcast when small: Catalyst/AQE
    decide; the keys side is usually a dimension table."""
    return df.join(F.broadcast(keys), on, "left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: str | list[str]) -> DataFrame:
    """J3 — exclude rows whose key appears in ``keys`` (hot-wallet sender
    skip, jobs/exchange_deposit_wallets_job.py:107-109)."""
    return df.join(F.broadcast(keys), on, "left_anti")


def distinct_senders(
    df: DataFrame, to_keys: DataFrame, lo: int, hi: int,
    from_col: str = "from_address", to_col: str = "to_address",
    block_col: str = "block_number",
) -> DataFrame:
    """S2 — the reference's pushed SQL scan (databases/postgresql.py:27-37):
    SELECT from_address FROM transfer_event WHERE to_address = ANY(...)
    AND block_number BETWEEN lo AND hi GROUP BY from_address."""
    keys = to_keys.withColumnRenamed(to_keys.columns[0], to_col)
    return (
        df.filter(F.col(block_col).between(lo, hi))
        .join(F.broadcast(keys), to_col, "left_semi")
        .select(from_col)
        .distinct()
    )


def native_transfer_filter(
    df: DataFrame, input_col: str = "input", value_col: str = "value",
    status_col: str = "receipt_status",
) -> DataFrame:
    """P4 — native transfers: input == '0x' AND value != '0' AND
    receipt_status == 1 (databases/blockchain_etl.py:68-75). The
    reference compares value as a string; cast at ingest (SURVEY §1.1)."""
    return df.filter(
        (F.col(input_col) == "0x")
        & (F.col(value_col).cast("decimal(38,0)") != 0)
        & (F.col(status_col) == 1)
    )


def recency_filter(
    df: DataFrame, key: str, ts: str, cutoff
) -> DataFrame:
    """P7 — keep keys whose latest event is at/after cutoff
    (jobs/lending_wallets_job.py:68-78: 30-day recency on change-logs).

    ``cutoff`` may be an epoch int for numeric ``ts`` columns or a
    datetime string for timestamp columns — the literal is cast
    explicitly to the ``ts`` column's type so the comparison never
    relies on implicit coercion (ANSI-safe).

    Plan: per-key max as a whole-partition window, filtered — ONE scan
    and ONE exchange. The previous groupBy + semi-join-back evaluated
    the source twice (agg side and join side): at warehouse scale that
    is two full passes over the table for one filter. NULL keys are
    dropped explicitly — the semi-join formulation (and the gate's
    ``IN (SELECT …)`` oracle) never matches a NULL key, whereas a
    window partition groups NULLs together and would retain them."""
    ts_type = df.schema[ts].dataType
    w = Window.partitionBy(key)
    return (
        df.filter(F.col(key).isNotNull())
        .withColumn("_latest", F.max(ts).over(w))
        .filter(F.col("_latest") >= F.lit(cutoff).cast(ts_type))
        .drop("_latest")
    )


def top1_per_key(df: DataFrame, key: str, order_col: str, desc: bool = True) -> DataFrame:
    """A6 — argmax per key (latest pairId via sort+find_one,
    databases/mongodb.py:167-174)."""
    w = Window.partitionBy(key).orderBy(
        F.desc(order_col) if desc else F.asc(order_col)
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def group_set_union(
    df: DataFrame, key: str, tag_col: str | None = None,
    struct_cols: list[str] | None = None,
) -> DataFrame:
    """A2/A9 — the reference's driver-dict wallet accumulation
    (jobs/exchange_deposit_wallets_job.py:71,106-119) + $addToSet merge
    (databases/mongodb.py:110-118): per key, set-union of tags and of
    protocol structs. Arrays are sorted for deterministic output."""
    aggs = []
    if tag_col:
        aggs.append(F.sort_array(F.collect_set(tag_col)).alias("tags"))
    if struct_cols:
        aggs.append(
            F.sort_array(F.collect_set(F.struct(*struct_cols))).alias("protocols")
        )
    return df.groupBy(key).agg(*aggs)


def tumbling_slices(
    df: DataFrame, ts: str, period: int, slice_col: str = "slice_start"
) -> DataFrame:
    """T2 — tumbling time slices: the reference's
    ``range(start, end, period)`` work partitioning
    (jobs/exchange_deposit_wallets_job.py:67) becomes a partition column;
    Spark schedules slices as tasks instead of thread-pool batches."""
    return df.withColumn(
        slice_col, (F.floor(F.col(ts) / F.lit(period)) * F.lit(period)).cast("long")
    )


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
    set_union_cols: list[str] | None = None,
    last_write_cols: list[str] | None = None,
    map_union_cols: list[str] | None = None,
) -> DataFrame:
    """S9 — Mongo bulk UpdateOne($set + $addToSet, upsert=True)
    (databases/mongodb.py:68-164) as a DataFrame merge:

    - rows only in ``updates`` are inserted,
    - matched rows take update values for ``last_write_cols`` ($set),
    - matched array columns in ``set_union_cols`` are set-unioned
      ($addToSet), sorted for determinism,
    - matched map-of-array columns in ``map_union_cols`` take the union
      of keys, set-unioning the arrays under shared keys — the
      reference's nested ``$addToSet: {field.project: {$each: [...]}}``
      over the wallet ``protocols`` dict (databases/mongodb.py:110-118,
      models/wallet/wallet.py:33-45).

    On an Iceberg/Delta catalog this is a single MERGE INTO; the
    DataFrame formulation keeps identical semantics on plain Parquet.
    """
    from ..functions.maps import merge_maps_array_union

    set_union_cols = set_union_cols or []
    map_union_cols = map_union_cols or []
    merged_cols = set_union_cols + map_union_cols
    last_write_cols = last_write_cols or [
        c for c in updates.columns if c not in keys and c not in merged_cols
    ]
    e = existing.select(
        *keys,
        *[F.col(c).alias(f"_e_{c}") for c in last_write_cols + merged_cols],
    )
    u = updates.select(
        *keys,
        *[F.col(c).alias(f"_u_{c}") for c in last_write_cols + merged_cols],
    )
    j = e.join(u, keys, "full_outer")
    out_cols = [F.col(k) for k in keys]
    for c in last_write_cols:
        out_cols.append(F.coalesce(F.col(f"_u_{c}"), F.col(f"_e_{c}")).alias(c))
    for c in set_union_cols:
        out_cols.append(
            F.sort_array(
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col(f"_e_{c}"), F.array()),
                        F.coalesce(F.col(f"_u_{c}"), F.array()),
                    )
                )
            ).alias(c)
        )
    for c in map_union_cols:
        out_cols.append(
            merge_maps_array_union(F.col(f"_e_{c}"), F.col(f"_u_{c}")).alias(c)
        )
    return j.select(*out_cols)


def _merge_update_exprs(
    keys: list[str],
    set_union_cols: list[str],
    last_write_cols: list[str],
    map_union_cols: list[str],
) -> list[str]:
    """SQL SET clauses mirroring merge_upsert's column semantics
    (t = target alias, u = updates alias)."""
    exprs = []
    for c in last_write_cols:
        exprs.append(f"t.{c} = u.{c}")
    for c in set_union_cols:
        exprs.append(
            f"t.{c} = sort_array(array_distinct(concat("
            f"coalesce(t.{c}, array()), coalesce(u.{c}, array()))))"
        )
    for c in map_union_cols:
        exprs.append(
            f"t.{c} = map_zip_with("
            f"coalesce(t.{c}, map()), coalesce(u.{c}, map()), "
            f"(k, x, y) -> sort_array(array_distinct(concat("
            f"coalesce(x, array()), coalesce(y, array())))))"
        )
    return exprs


def merge_upsert_table(
    spark,
    target_table: str,
    updates: DataFrame,
    keys: list[str],
    set_union_cols: list[str] | None = None,
    last_write_cols: list[str] | None = None,
    map_union_cols: list[str] | None = None,
) -> None:
    """S9, catalog-native: upsert ``updates`` into ``target_table``.

    When the catalog supports row-level operations (Iceberg/Delta — the
    transactional sink SURVEY §2.1 promises), this is ONE ``MERGE INTO``
    statement: the engine rewrites only the touched files, concurrent
    readers see a consistent snapshot, and no full-table shuffle happens
    for a small update batch. On a plain-Parquet catalog (this
    container) the statement fails at analysis and the call falls back
    to the DataFrame ``merge_upsert`` + eager materialization +
    overwrite — identical final table contents, minus transactionality.

    Column semantics match ``merge_upsert`` exactly: ``last_write_cols``
    = $set, ``set_union_cols`` = $addToSet, ``map_union_cols`` = nested
    per-key $addToSet (databases/mongodb.py:68-164).
    """
    set_union_cols = set_union_cols or []
    map_union_cols = map_union_cols or []
    merged = set_union_cols + map_union_cols
    last_write_cols = last_write_cols or [
        c for c in updates.columns if c not in keys and c not in merged
    ]
    view = f"_merge_updates_{abs(hash(target_table)) % 10**8}"
    updates.createOrReplaceTempView(view)
    on = " AND ".join(f"t.{k} = u.{k}" for k in keys)
    sets = ", ".join(
        _merge_update_exprs(keys, set_union_cols, last_write_cols, map_union_cols)
    )
    stmt = (
        f"MERGE INTO {target_table} t USING {view} u ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT *"
    )
    try:
        spark.sql(stmt)
        return
    except Exception:
        # no row-level-operation support in this catalog/format —
        # DataFrame fallback with identical semantics
        existing = spark.table(target_table)
        out = merge_upsert(
            existing, updates, keys,
            set_union_cols=set_union_cols,
            last_write_cols=last_write_cols,
            map_union_cols=map_union_cols,
        )
        # materialize before overwriting the table the plan reads from;
        # insertInto matches by POSITION, so reorder to the table schema
        out = out.select(*existing.columns).localCheckpoint(eager=True)
        out.write.mode("overwrite").insertInto(target_table, overwrite=True)
    finally:
        spark.catalog.dropTempView(view)
