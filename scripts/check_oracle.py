#!/usr/bin/env python
"""Local emulation of the driver's t2 correctness gate.

Runs every declared query (optionally filtered by substring argv[1]) on
Spark and its DuckDB oracle at sf0.01, then compares row count, column
names/dtypes, and cell values after sorting columns by name and rows by all
columns — a strictly harsher check than the driver's order-insensitive
value hash.

Usage: python scripts/check_oracle.py [name_substring] [--sf DIR] [--json OUT]

``--json OUT`` writes the per-query record (status ok/rows/fail, row
count, runtime, problems) — the committed full-surface correctness
artifact (`CORRECTNESS_local_r{N}.json`, VERDICT r9 #2).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_hits_spark import queries as q
from bigdata_hits_spark.session import get_spark
from bigdata_hits_spark.sources.readers import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count differ: spark={len(spark_df)} duck={len(duck_df)}")
        return problems
    a, b = canon(spark_df), canon(duck_df)
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.floating):
            eq = (a[c].values == b[c].values) | (np.isnan(a[c].values) & np.isnan(b[c].values))
        else:
            eq = a[c].values == b[c].values
        bad = int((~eq).sum())
        if bad:
            idx = int(np.argmax(~eq))
            problems.append(
                f"{bad} mismatching cells in col {c!r}; first at row {idx}: "
                f"spark={a[c].iloc[idx]!r} duck={b[c].iloc[idx]!r}"
            )
    return problems


def main() -> int:
    filt = None
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    args = [a for a in sys.argv[1:]]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    names_exact = None
    if "--names" in args:
        # comma-separated EXACT names (or @file with one name per line):
        # the slice runner for long sf-scaled passes — run the surface in
        # resumable chunks and merge the per-slice --json records.
        i = args.index("--names")
        spec = args[i + 1]
        del args[i : i + 2]
        if spec.startswith("@"):
            with open(spec[1:]) as f:
                names_exact = [ln.strip() for ln in f if ln.strip()]
        else:
            names_exact = [s for s in spec.split(",") if s]
    if args:
        filt = args[0]

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    all_q = q.queries()
    all_o = q.oracle_sql()
    names = [n for n in all_q if filt is None or filt in n]
    if names_exact is not None:
        missing = [n for n in names_exact if n not in all_q]
        if missing:
            print(f"unknown query names: {missing}")
            return 1
        names = [n for n in names if n in set(names_exact)]
    failed = []
    record: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = all_q[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            record[name] = {"status": "fail", "sec": round(time.time() - t0, 2),
                            "problems": [f"spark error: {e}"]}
            continue
        if name not in all_o:
            dt = time.time() - t0
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle; rows-only) [{dt:.1f}s]")
            record[name] = {"status": "rows", "rows": len(sdf), "sec": round(dt, 2)}
            continue
        try:
            ddf = con.execute(all_o[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            record[name] = {"status": "fail", "sec": round(time.time() - t0, 2),
                            "problems": [f"duckdb error: {e}"]}
            continue
        problems = compare(name, sdf, ddf)
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name} [{dt:.1f}s]")
            for p in problems:
                print(f"      - {p}")
            failed.append(name)
            record[name] = {"status": "fail", "rows": len(sdf), "sec": round(dt, 2),
                            "problems": problems}
        else:
            print(f"OK    {name}: {len(sdf)} rows match [{dt:.1f}s]")
            record[name] = {"status": "ok", "rows": len(sdf), "sec": round(dt, 2)}
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if json_out:
        import json

        n_ok = sum(1 for r in record.values() if r["status"] == "ok")
        n_rows = sum(1 for r in record.values() if r["status"] == "rows")
        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(names),
            "n_oracle_ok": n_ok,
            "n_rows_only": n_rows,
            "n_failed": len(failed),
            "failed": sorted(failed),
            "queries": record,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
