#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against views over <sfDir>/*.parquet, load the Spark result parquet from
<verifyOutDir>/<name>/, sort columns by name and rows by all columns, and
compare values exactly (floats via exact float64 equality, timestamps
normalized to ns). Reports per-query PASS/FAIL with a diff sample.
"""
import glob
import json
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[ns]")
        elif s.dtype == object:
            # decimals / bytes → str for stable compare
            df[c] = s.map(lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                          else str(v))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            exp = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        eq = True
        for c in got.columns:
            a, b = got[c].values, exp[c].values
            if pd.api.types.is_float_dtype(got[c]):
                ok = np.array_equal(a, b, equal_nan=True)
            else:
                ok = (pd.Series(a).fillna("§") == pd.Series(b).fillna("§")).all()
            if not ok:
                idx = next(i for i in range(len(a))
                           if not (a[i] == b[i] or (pd.isna(a[i]) and pd.isna(b[i]))))
                print(f"FAIL {name}: col {c} row {idx}: "
                      f"spark={a[idx]!r} duckdb={b[idx]!r}")
                eq = False
                break
        if eq:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracles total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
