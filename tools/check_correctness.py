"""Local mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB at
the given sf dir, and compares row count + column names + an
order-insensitive value hash (columns sorted by name, rows sorted, floats
rounded to 9 significant decimals before hashing).

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from sdc_spark.session import get_spark  # noqa: E402
from sdc_spark.sources.readers import TABLES, table_path  # noqa: E402


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            dt = pd.to_datetime(s)
            if getattr(dt.dt, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    order_cols = list(df.columns)
    try:
        df = df.sort_values(order_cols, kind="mergesort", na_position="last")
    except TypeError:
        df = df.sort_values(order_cols, key=lambda s: s.astype(str), kind="mergesort")
    return df.reset_index(drop=True)


def value_repr(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update("|".join(value_repr(v) for v in row).encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            # release blocks the query's localCheckpoints pinned (safe:
            # the result is fully materialized in spdf) — without this a
            # 100-query session accumulates block-manager state and the
            # tail degrades progressively (observed round 3)
            spark.catalog.clearCache()
            try:
                for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                    jrdd.unpersist(False)
            except Exception:  # noqa: BLE001
                pass
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sc, oc = canonicalize(spdf), canonicalize(odf)
        problems = []
        if len(sc) != len(oc):
            problems.append(f"rows {len(sc)} vs {len(oc)}")
        if list(sc.columns) != list(oc.columns):
            problems.append(f"cols {list(sc.columns)} vs {list(oc.columns)}")
        elif frame_hash(sc) != frame_hash(oc):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            if "value-hash mismatch" in problems and len(sc) == len(oc):
                diff_mask = (sc.astype(str) != oc.astype(str)).any(axis=1)
                print("  spark:", sc[diff_mask].head(3).to_dict("records"))
                print("  duck :", oc[diff_mask].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sc)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
