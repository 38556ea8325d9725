#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_outdir> <sf_dir>

Reads each <verify_outdir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the sf_dir
tables, and compares: row count, column names, and exact values after
sorting columns by name and rows by all columns. Mirrors (conservatively)
the driver's row/schema/hash match.
"""
import duckdb
import glob
import json
import os
import sys

import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        key = df.astype(str)
        order = key.sort_values(by=list(df.columns)).index
        df = df.loc[order].reset_index(drop=True)
    return df


def main() -> None:
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle_sql = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                             ignore_index=True)
        if name not in oracle_sql:
            print(f"ROWS {name}: rows={len(spark_df)} (no oracle)")
            n_rowsonly += 1
            continue
        try:
            oracle_df = con.execute(oracle_sql[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} != {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} != {len(b)}")
            n_fail += 1
            continue
        # The driver's hash compare is dtype-sensitive (e.g. DuckDB SUM(int)
        # → HUGEINT → float64/object in pandas vs Spark's int64 broke q14 in
        # r1 despite values being equal). Surface kind mismatches loudly.
        kind_mismatch = [
            (c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
            if a[c].dtype.kind != b[c].dtype.kind]
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            if kind_mismatch:
                print(f"FAIL {name}: values equal but dtype kinds differ "
                      f"(driver hash would mismatch): {kind_mismatch}")
                n_fail += 1
                continue
            print(f"PASS {name}: rows={len(a)}")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).splitlines()
            print(f"FAIL {name}: values differ: {' | '.join(msg[:3])}")
            # show a few mismatching cells
            for c in a.columns:
                neq = ~(a[c].eq(b[c]) | (a[c].isna() & b[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"  col {c}: spark={a[c][i]!r} oracle={b[c][i]!r} "
                          f"(+{int(neq.sum()) - 1} more)")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only "
          f"of {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
