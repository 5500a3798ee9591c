#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark). Usage:

    python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same testdata
tables, sorts columns by name + rows by all columns, and compares values.
"""
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import glob
import os

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(got)} rows")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        bad = None
        for col in g.columns:
            gv, ev = g[col].tolist(), e[col].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cmp_cell(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        # dtype drift report (informational — driver may be stricter)
        dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
              if str(g[c].dtype) != str(e[c].dtype)]
        if bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r}")
            n_fail += 1
        else:
            extra = f"  [dtype drift: {dt}]" if dt else ""
            print(f"PASS {name}: {len(g)} rows{extra}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
