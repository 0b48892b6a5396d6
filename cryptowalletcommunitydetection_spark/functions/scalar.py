"""Scalar function surface (SURVEY.md §2.7 F1-F15), all JVM-side.

Each helper returns a Column built from pyspark.sql.functions — no
Python executes per row. Reference citations inline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_address(col) -> Column:
    """F1 — lowercase hex address (utils/utils.py:31-34,
    databases/blockchain_etl.py:61)."""
    return F.lower(F.col(col) if isinstance(col, str) else col)


def composite_key(*cols, sep: str = "_") -> Column:
    """F2 — `f"{chain}_{address}"` / `f"{block}_{hash}_{logidx}"` keys
    (databases/mongodb.py:71,131,284; models/protocol.py:48)."""
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


def split_composite_key(col, n: int = 2, sep: str = "_") -> list[Column]:
    """F3 — `chain_address.split('_')` (jobs/lending_wallets_job.py:55)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, sep, n)
    return [parts.getItem(i) for i in range(n)]


def deterministic_id(*cols, prefix: str = "") -> Column:
    """F4 — replaces the reference's uuid4 group ids
    (services/wallet_clustering.py:6-7,33): sha256 of the natural key, so
    reruns/resumes produce identical ids."""
    key = F.concat_ws("|", F.lit(prefix), *[F.col(c) if isinstance(c, str) else c for c in cols])
    return F.sha2(key, 256)


def content_sha256(col) -> Column:
    """F15 — the north-rule per-row invariant."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


# '$1.2m' → 1_200_000.0 etc. (utils/format_utils.py:9-37: strips $ and
# commas, multiplies k/m/b suffixes)
_HUMAN_NUM = r"^\$?([0-9,]*\.?[0-9]+)\s*([kKmMbB]?)$"


def parse_human_amount(col) -> Column:
    """F5 — human-unit amount parse (utils/format_utils.py:9-37)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    num = F.regexp_replace(F.regexp_extract(c, _HUMAN_NUM, 1), ",", "").cast("double")
    suffix = F.lower(F.regexp_extract(c, _HUMAN_NUM, 2))
    mult = (
        F.when(suffix == "k", 1e3)
        .when(suffix == "m", 1e6)
        .when(suffix == "b", 1e9)
        .otherwise(1.0)
    )
    return num * mult


def parse_percentage(col) -> Column:
    """F6 — '12.5%' → 0.125 (utils/format_utils.py:59-73)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), "%", "").cast("double") / 100.0


def parse_datestr_unix(col, fmt: str = "MMM-dd-yyyy hh:mm:ss a") -> Column:
    """F7 — '%b-%d-%Y %I:%M:%S %p' → unix seconds
    (utils/format_utils.py:40-43,86-87)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c, fmt)


def regexp_allowlist(col, allowed: str = r"[^0-9a-zA-Z\.\-% ]") -> Column:
    """F8 — strip disallowed characters (utils/format_utils.py:46-56)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, allowed, "")


def snake_to_camel(name: str) -> str:
    """F9 — metadata-only column rename (utils/format_utils.py:90-96)."""
    head, *rest = name.split("_")
    return head + "".join(w.capitalize() for w in rest)


def token_value_usd(reserve_col, decimals_col, price_col) -> Column:
    """F10 — `reserve / 10**decimals * price`
    (jobs/dex_wallets/export_lp_contracts_job.py:139-146)."""
    r = F.col(reserve_col) if isinstance(reserve_col, str) else reserve_col
    d = F.col(decimals_col) if isinstance(decimals_col, str) else decimals_col
    p = F.col(price_col) if isinstance(price_col, str) else price_col
    return r.cast("double") / F.pow(F.lit(10.0), d.cast("double")) * p
