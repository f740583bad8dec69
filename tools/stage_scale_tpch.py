#!/usr/bin/env python3
"""Stage 10x/100x FACT-TABLE replicas of sf0.1 lineitem/orders for the
round-7 relational scaling check (dev tool only; same protocol family as
stage_scale_replicas.py).

Replica design: o_orderkey/l_orderkey shift by r*100_000_000 per copy so
the order↔lineitem relation is preserved within each copy with zero
cross-copy collisions; part/supplier/customer/nation/region are NOT
replicated — facts grow, dimensions stay fixed, which is the realistic
100 TB shape (and what makes broadcast-dim plans the right answer).
Dates/quantities/prices are copied verbatim, so per-copy aggregates are
identical and a correct engine's q1 group sums scale exactly linearly.

Usage: python3 tools/stage_scale_tpch.py <outBase>
Writes <outBase>/x{10,100}/{lineitem,orders}.parquet and symlink-copies
the dimension tables so a replica dir is a complete fixture layout.
"""
import os
import shutil
import sys

import duckdb

out = sys.argv[1]
src = "/root/testdata/sf0.1"
DIMS = ["region", "nation", "customer", "supplier", "part",
        "events", "documents", "embeddings"]

con = duckdb.connect()
for scale in (10, 100):
    d = f"{out}/x{scale}"
    os.makedirs(d, exist_ok=True)
    con.execute(f"""
        COPY (
          SELECT l_orderkey + r * 100000000 AS l_orderkey, l_partkey,
                 l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{src}/lineitem.parquet'),
               range({scale}) t(r)
        ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT o_orderkey + r * 100000000 AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{src}/orders.parquet'),
               range({scale}) t(r)
        ) TO '{d}/orders.parquet' (FORMAT PARQUET)""")
    for t in DIMS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{d}/lineitem.parquet')"
    ).fetchone()[0]
    print(f"x{scale}: {n} lineitem rows staged at {d}")
