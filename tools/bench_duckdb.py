#!/usr/bin/env python3
"""Single-node DuckDB timings for every oracle-able headline query — the
"reference engine" side of the throughput comparison (the reference
delegates all execution to DuckDB, so DuckDB on the same parquet at the
same scale factor IS its single-node baseline).

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir-with-oracle_sql.json>
Prints one JSON line per run: {"query": name, "sec": best-of-3}.
"""
import json
import sys
import time

import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

HEADLINE = ["q05_agg_global", "q06_tpch_q1", "q12_join_agg",
            "q17_window_rank", "q30_events_hourly",
            "q41_dedup_ngram_jaccard", "q44_embedding_neardup",
            "q45_ann_topk", "q47_text_tokens", "q56_percentiles",
            "q57_events_sessions", "q58_asof_join"]


def main(sf_dir: str, out_dir: str, only=None) -> None:
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark writes parquet as a directory
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in (only or HEADLINE):
        if name not in oracle:
            continue
        best = None
        for _ in range(3):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 4)
        print(f"{name:28s} {best:8.3f} s")
    total = round(sum(results.values()), 3)
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "unit": "sec", "queries": results, "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3].split(",") if len(sys.argv) > 3 else None)
