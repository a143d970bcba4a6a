#!/usr/bin/env python3
"""DuckDB side of the scale-tier (sf1/sf10) full-basket comparison.

Differences from bench_duckdb.py: every query runs in a SUBPROCESS with
a hard timeout (at sf10 some formulations run 20+ minutes — a timeout is
reported as such instead of hanging the harness), repeats emit
min/median/max, and q94 gets the approx_quantile comparable (its oracle
SQL is the audit's constant assertion, which would measure a bare scan).

Usage: python3 tools/bench_tier_duckdb.py <sfDir> <oracleDir> [q1,q2,...]
"""
import json
import multiprocessing as mp
import os
import shutil
import statistics
import sys
import tempfile
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# every graft.Bench basket row with a DuckDB-runnable oracle: the
# original 20 comparables plus the bucketed/sorted production twins
# (DuckDB runs the SAME SQL — its comparable is layout-independent)
# and the served-BM25 row (DuckDB comparable is the full-pass BM25
# formulation, q165's oracle). q42/q46/q171/q189 have engine-defined
# rows (no oracle) and stay graft-only.
BASKET = ["q05_agg_global", "q06_tpch_q1", "q12_join_agg",
          "q17_window_rank", "q30_events_hourly",
          "q41_dedup_ngram_jaccard", "q44_embedding_neardup",
          "q45_ann_topk", "q47_text_tokens", "q94_approx_quantile",
          "q56_percentiles", "q97_shard_packing", "q57_events_sessions",
          "q58_asof_join", "q68_tpch_q3", "q69_tpch_q5",
          "q123_curation_pipeline", "q130_passage_dedup", "q138_tfidf",
          "q140_range_join",
          "q154_join_agg_bucketed", "q155_tpch_q3_bucketed",
          "q156_tpch_q5_bucketed", "q161_events_sessions_bucketed",
          "q162_asof_join_bucketed", "q163_shard_packing_bucketed",
          "q164_events_hourly_rollup", "q173_substring_spans",
          "q174_zorder_box", "q175_time_range_daily",
          "q196_bm25_served"]

Q94_APPROX = """SELECT l_returnflag,
  approx_quantile(l_extendedprice, 0.5) AS med,
  approx_quantile(l_extendedprice, 0.9) AS p90,
  approx_quantile(l_extendedprice, 0.1) AS p10
FROM lineitem GROUP BY l_returnflag"""

TIMEOUT_S = int(os.environ.get("DUCKDB_TIMEOUT_S", "300"))
REPEATS = int(os.environ.get("DUCKDB_REPEATS", "5"))


def run_once(sf_dir, sql, q, tmp_dir):
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    # spill into a per-query dir the PARENT removes even after a
    # timeout terminate — a killed q44/q123 subprocess otherwise leaks
    # tens of GB of duckdb_temp_storage-*.tmp
    con.execute(f"SET temp_directory='{tmp_dir}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{path}')")
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        con.execute(sql).fetchall()
        times.append(time.time() - t0)
    q.put(times)


def tier_hash(sf_dir):
    """(relative path, size, head+tail 4 KB blocks) fingerprint
    matching graft.Bench's content-strengthened tier_hash (r18), so the
    two engines' artifacts pin the same data BY CONTENT — a
    size-preserving regeneration cannot collide."""
    import hashlib
    md = hashlib.md5()
    files = []
    for root, _, fs in os.walk(sf_dir):
        for f in fs:
            p = os.path.join(root, f)
            files.append((os.path.relpath(p, sf_dir), p))
    for rel, p in sorted(files):
        size = os.path.getsize(p)
        md.update(f"{rel}:{size}:".encode())
        with open(p, "rb") as fh:
            md.update(fh.read(4096))
            if size > 4096:
                fh.seek(size - 4096)
                md.update(fh.read(4096))
    return md.hexdigest()[:16]


def main(sf_dir, oracle_dir, only=None):
    print(f"tier={sf_dir} tier_hash={tier_hash(sf_dir)}")
    oracle = json.load(open(f"{oracle_dir}/oracle_sql.json"))
    oracle["q94_approx_quantile"] = Q94_APPROX
    results = {}
    for name in (only or BASKET):
        if name not in oracle:
            print(f"{name:28s} (no oracle SQL — skipped)")
            continue
        q = mp.Queue()
        tmp_dir = tempfile.mkdtemp(prefix="duck_tier_")
        p = mp.Process(target=run_once,
                       args=(sf_dir, oracle[name], q, tmp_dir))
        p.start()
        p.join(TIMEOUT_S * REPEATS)
        timed_out = p.is_alive()
        if timed_out:
            p.terminate()
            p.join()
        shutil.rmtree(tmp_dir, ignore_errors=True)
        if timed_out:
            print(f"{name:28s} TIMEOUT >{TIMEOUT_S * REPEATS}s total")
            results[name] = None
            continue
        times = sorted(q.get())
        med = statistics.median(times)
        results[name] = [round(times[0], 3), round(med, 3),
                         round(times[-1], 3)]
        print(f"{name:28s} median={med:8.3f} s  "
              f"min={times[0]:.3f}  max={times[-1]:.3f}")
    print(json.dumps({"metric": "duckdb_tier", "sf": sf_dir,
                      "tier_hash": tier_hash(sf_dir),
                      "spread": results}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3].split(",") if len(sys.argv) > 3 else None)
