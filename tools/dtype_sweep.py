"""Dtype-equality sweep: Spark result vs DuckDB oracle, per query.

The driver's correctness gate hashes TYPED values (``323`` != ``323.0``),
while tools/check_correctness.py canonicalizes integral floats — so a
Spark bigint vs DuckDB HUGEINT->float64 asymmetry passes locally but is
red for the driver (round-6 verdict, What's wrong #1). This sweep runs
every oracled query at a small sf and reports any column whose dtype
*kind* differs between the Spark result and the oracle result.

Kind rule (matches what the driver's value hash distinguishes):
  int-like (i/u) vs float (f) vs bool (b) vs datetime (M) vs object (O).
A difference of width (int32 vs int64) is reported separately as WIDTH —
int32 vs int64 hash identically via str(), so WIDTH rows are informational.

Usage: python tools/dtype_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from sdc_spark.session import get_spark  # noqa: E402
from sdc_spark.sources.readers import TABLES, table_path  # noqa: E402


def kind(dtype) -> str:
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    return {"b": "bool", "M": "datetime", "m": "timedelta", "O": "object"}.get(k, k)


def sweep(sf_dir: str, only: set[str] | None = None, verbose: bool = True):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("dtype_sweep")
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    mismatches: dict[str, list[str]] = {}
    widths: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
            spark.catalog.clearCache()
            try:
                for jrdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    jrdd.unpersist(False)
            except Exception:  # noqa: BLE001
                pass
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"
            if verbose:
                print(f"ERR   {name}: {errors[name]}")
            continue
        bad, wid = [], []
        for c in spdf.columns:
            if c not in odf.columns:
                continue
            sk, ok_ = kind(spdf[c].dtype), kind(odf[c].dtype)
            if sk != ok_:
                # object-vs-other is usually a null-only column at tiny sf;
                # still report, the caller decides
                bad.append(f"{c}: spark={spdf[c].dtype} oracle={odf[c].dtype}")
            elif spdf[c].dtype != odf[c].dtype and sk in ("int", "float"):
                wid.append(f"{c}: spark={spdf[c].dtype} oracle={odf[c].dtype}")
        if bad:
            mismatches[name] = bad
            if verbose:
                print(f"KIND  {name}: {'; '.join(bad)} [{time.time()-t0:.1f}s]")
        elif wid:
            widths[name] = wid
            if verbose:
                print(f"WIDTH {name}: {'; '.join(wid)} [{time.time()-t0:.1f}s]")
        elif verbose:
            print(f"ok    {name} [{time.time()-t0:.1f}s]")
    return mismatches, widths, errors


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:]) or None
    mismatches, widths, errors = sweep(sf_dir, only)
    print(
        f"\n{len(mismatches)} kind-mismatched, {len(widths)} width-only, "
        f"{len(errors)} errors"
    )
    for n in sorted(mismatches):
        print(" ", n)
    return 1 if mismatches or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
