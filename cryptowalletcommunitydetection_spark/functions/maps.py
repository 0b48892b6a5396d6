"""Map-reshape function family (SURVEY.md §2 X6, F11-F13), all JVM-side.

The reference's wallet documents are dicts-of-dicts (``protocols`` maps
keyed by project id, change-logs keyed by timestamp). These helpers
re-express that dict plumbing over Spark ``MapType`` columns with
higher-order functions — no Python executes per row:

- ``prefix_map_keys``     — utils/utils.py:221-226 ``add_prefix_to_key_of_dict``
                            and :195-199 ``concat_chain_id`` (chainId_token keys)
- ``map_null_filter``     — utils/list_dict_utils.py:7-16 ``filter_none_keys``
- ``cast_map_keys_long``  — utils/list_dict_utils.py:29-30 ``to_change_logs``
                            (str timestamp keys -> int)
- ``merge_maps_sum``      — utils/utils.py:122-130 ``aggregate_separated_logs``
                            and :228-233 ``set_or_add_to_dict`` (shared keys add)
- ``merge_maps_array_union`` — databases/mongodb.py:106-118 ``$addToSet`` with
                            ``$each`` per nested ``field.project`` path
- ``entries_to_map`` / ``explode_map`` — databases/mongodb.py:106-118 dot-path
                            reshape between row form and nested-doc form
- ``sorted_map_entries``  — utils/list_dict_utils.py:33-34 ``sorted_dict``
                            (Spark maps are unordered; ordering lives in the
                            entry array)

Scale note: every helper is a per-row expression (whole-stage codegen),
so they compose with joins/aggregations without extra shuffles; the only
shuffle in ``entries_to_map`` is its ``groupBy``, which benefits from
map-side partial ``collect_list`` on pre-deduplicated (key,value) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def prefix_map_keys(col, prefix: str, sep: str = "_") -> Column:
    """F11a — ``{k: v} -> {f"{prefix}{sep}{k}": v}``."""
    return F.transform_keys(
        _c(col), lambda k, v: F.concat(F.lit(prefix), F.lit(sep), k.cast("string"))
    )


def map_null_filter(col) -> Column:
    """F12 — drop entries whose value is NULL (``filter_none_keys``)."""
    return F.map_filter(_c(col), lambda k, v: v.isNotNull())


def cast_map_keys_long(col, lenient: bool = False) -> Column:
    """F13 — string keys -> int64 (``{int(t): v for t, v in d.items()}``).

    ANSI notes (default strict mode, matching the reference's ``int(t)``):

    - a non-numeric key raises,
    - keys that COLLIDE after the cast (``"1"`` and ``"01"``, ``"1"`` and
      ``" 1"``) raise at runtime under the default
      ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` — ``transform_keys`` can
      otherwise silently produce a duplicate-key map.

    ``lenient=True`` pre-normalizes through the entry array instead:
    non-numeric keys are dropped (``try_cast`` null) and collided keys
    keep the LAST entry's value (Python-dict comprehension semantics,
    where later ``int(t)`` wins).
    """
    c = _c(col)
    if not lenient:
        return F.transform_keys(c, lambda k, v: k.cast("long"))
    ents = F.filter(
        F.transform(
            F.map_entries(c),
            lambda e: F.struct(
                e["key"].try_cast("long").alias("key"), e["value"].alias("value")
            ),
        ),
        lambda e: e["key"].isNotNull(),
    )
    # dedup by key keeping the last occurrence: walk the reversed entry
    # array, appending only first-seen keys (accumulator seeded with an
    # empty slice so its type matches without a cast)
    dedup = F.aggregate(
        F.reverse(ents),
        F.slice(ents, 1, 0),
        lambda acc, e: F.when(
            F.exists(acc, lambda x: x["key"] == e["key"]), acc
        ).otherwise(F.array_append(acc, e)),
    )
    return F.map_from_entries(dedup)


def cast_map_keys_string(col) -> Column:
    """Inverse of ``cast_map_keys_long`` (Mongo round-trip: document
    field names are always strings)."""
    return F.transform_keys(_c(col), lambda k, v: k.cast("string"))


def merge_maps_sum(a, b) -> Column:
    """F11b — union of keys; shared keys add their numeric values
    (``aggregate_separated_logs`` / ``set_or_add_to_dict``). NULL maps
    are treated as empty."""
    left = F.coalesce(_c(a), F.map_from_arrays(F.array(), F.array()))
    right = F.coalesce(_c(b), F.map_from_arrays(F.array(), F.array()))
    return F.map_zip_with(
        left, right, lambda k, x, y: F.coalesce(x, F.lit(0)) + F.coalesce(y, F.lit(0))
    )


def merge_maps_array_union(a, b) -> Column:
    """S9/F11c — union of keys; shared keys set-union their array values,
    sorted for determinism (Mongo ``$addToSet: {f.k: {$each: [...]}}``,
    databases/mongodb.py:110-118). NULL maps are treated as empty."""
    empty = F.map_from_arrays(F.array(), F.array())
    return F.map_zip_with(
        F.coalesce(_c(a), empty),
        F.coalesce(_c(b), empty),
        lambda k, x, y: F.sort_array(
            F.array_distinct(
                F.concat(F.coalesce(x, F.array()), F.coalesce(y, F.array()))
            )
        ),
    )


def last_write_map_merge(a, b) -> Column:
    """Update-wins key union (``dict.update`` semantics,
    utils/utils.py:146-160 ``update_token_change_logs`` outer level):
    keys of ``b`` overwrite matching keys of ``a``."""
    empty = F.map_from_arrays(F.array(), F.array())
    return F.map_zip_with(
        F.coalesce(_c(a), empty), F.coalesce(_c(b), empty),
        lambda k, x, y: F.coalesce(y, x),
    )


def entries_to_map(
    df: DataFrame, group_cols: list[str], key_col: str, value_col: str,
    out_col: str = "m",
) -> DataFrame:
    """X6 — (group, k, v) rows -> one map per group.

    ``map_from_entries(collect_list(struct(k, v)))``; duplicate keys must
    be pre-aggregated (ANSI map-key-dedup policy raises otherwise), which
    keeps the semantics explicit instead of last-write-wins by accident.
    """
    return df.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(key_col).alias("key"), F.col(value_col).alias("value")))
        ).alias(out_col)
    )


def explode_map(df: DataFrame, map_col: str, keep_cols: list[str]) -> DataFrame:
    """X6 inverse — one (key, value) row per map entry."""
    return df.select(*keep_cols, F.explode(_c(map_col)).alias("key", "value"))


def sorted_map_entries(col, reverse: bool = False) -> Column:
    """``sorted_dict`` — entry array sorted by key (maps are unordered;
    downstream as-of scans over change-logs want the sorted entry list)."""
    return F.sort_array(F.map_entries(_c(col)), asc=not reverse)
