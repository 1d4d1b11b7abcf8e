"""Simulate the driver's correctness gate: run every queries() entry at a given sf,
compare against oracle_sql() via DuckDB (row count + schema names + order-insensitive
value comparison). Usage: python tools/check_contract.py [sf_dir]"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA-MISMATCH ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT-MISMATCH ray={len(ray_df)} sql={len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True):
                mx = np.max(np.abs(av.astype(float) - bv.astype(float)))
                return f"VALUE-MISMATCH col={c} max_abs_diff={mx}"
        else:
            if not (av == bv).all():
                i = int(np.nonzero(av != bv)[0][0])
                return f"VALUE-MISMATCH col={c} first ray={av[i]!r} sql={bv[i]!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name:24s} ERROR {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name in sqls:
            sql_df = con.execute(sqls[name]).fetchdf()
            verdict = compare(res, sql_df)
        else:
            verdict = f"rows-only ({len(res)} rows)"
        status = "OK" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:24s} {dt:6.2f}s  {verdict}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
