#!/usr/bin/env python3
"""DuckDB side of the round-5 LLM-hot-path scaling experiment (dev tool).

Times the DuckDB restatements of the oracle-able LLM hot-path keys on the
1x/10x/100x corpora (4 threads, min of 2 warm reps — the BASELINE.md
anchor protocol). The SQL is the keys' own oracle text where one exists
(ngram_jaccard, near, survivor, knn_join), loaded from a Verify dump.

Usage: python3 tools/scale_duckdb.py <oracle_sql.json> <dir> [keys...]
Prints: DUCK <dir> <key> time=<sec> rows=<n>
"""
import json
import sys
import time

import duckdb

oracle = json.load(open(sys.argv[1]))
d = sys.argv[2]
keys = sys.argv[3:] or [
    "llm_dedup_ngram_jaccard", "llm_dedup_near",
    "llm_dedup_survivor", "llm_knn_join"]

con = duckdb.connect()
con.execute("SET threads TO 4")
for t in ("documents", "embeddings"):
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")

for k in keys:
    sql = oracle[k]
    best, rows = None, None
    for _ in range(2):
        t0 = time.time()
        rows = len(con.execute(sql).fetchall())
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"DUCK {d} {k} time={best:.3f} rows={rows}", flush=True)
