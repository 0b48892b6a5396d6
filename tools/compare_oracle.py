"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares with the matching
``oracle_sql()`` via DuckDB: row count, schema (column names), and an
order-insensitive value comparison (rows sorted by all columns as
strings). Reports per-query PASS/FAIL with diffs.

Usage: python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        # strict: no rounding here — any tolerance must live in the query
        # itself (round(...)), symmetrically on both sides
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)):
            return str([cell(x) for x in v])
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from cryptowalletcommunitydetection_spark import build_session

    spark = build_session(app_name="oracle-compare")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows, {dt:.1f}s")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, oc = sorted(spdf.columns), sorted(odf.columns)
        if sc != oc:
            print(f"FAIL {name}: schema mismatch spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(spdf) != len(odf):
            print(f"FAIL {name}: rowcount spark={len(spdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        a, b = canon(spdf), canon(odf)
        if a.equals(b):
            print(f"PASS {name}: {len(spdf)} rows, {dt:.1f}s")
            n_pass += 1
        else:
            neq = (a != b).any(axis=1)
            print(f"FAIL {name}: {neq.sum()} differing rows of {len(a)}")
            print("  spark:", a[neq].head(3).to_dict("records"))
            print("  oracle:", b[neq].head(3).to_dict("records"))
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
