"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark AND its oracle_sql() on
DuckDB over the same sf dir; compare row count, column names, and
(order-insensitively) values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
       python tools/check_oracles.py [query ...]   # default sf0.01
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    errs = []
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if list(a.columns) != list(b.columns):
        errs.append(f"columns: spark={list(a.columns)} oracle={list(b.columns)}")
        return errs
    if len(a) != len(b):
        errs.append(f"rowcount: spark={len(a)} oracle={len(b)}")
        return errs
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            aa = av.astype("float64").to_numpy()
            bb = bv.astype("float64").to_numpy()
            ok = np.isclose(aa, bb, rtol=1e-9, atol=1e-9, equal_nan=True)
            if not ok.all():
                i = int(np.flatnonzero(~ok)[0])
                errs.append(f"col {c} float mismatch at row {i}: {aa[i]} vs {bb[i]}")
            if not np.array_equal(aa, bb, equal_nan=True):
                print(f"    [warn] {name}.{c}: float values not bit-identical (driver hash may differ)")
        else:
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                i = int(np.flatnonzero(neq.to_numpy())[0])
                errs.append(f"col {c} mismatch at row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
    return errs


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and ("/" in args[0] or args[0].startswith("sf")):
        sf_dir = args.pop(0)
    only = set(args)

    import __spark_entry__ as entrymod
    from gdal_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(spdf)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        errs = compare(name, spdf, opdf)
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            failed.append(name)
        else:
            print(f"ok   {name}: rows={len(spdf)} [{time.time()-t0:.1f}s]")
    missing = set(oracles) - set(queries)
    if missing:
        print(f"FAIL oracle entries without queries: {sorted(missing)}")
        failed.append("_registry")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
