#!/usr/bin/env python3
"""Stage 10x/100x replicas of the sf0.1 documents/embeddings tables for
the round-5 LLM-hot-path scaling experiment (dev tool only; r4 verdict
item 2 — same protocol as BASELINE.md's relational experiment).

Replica design: doc_ids shift by r*10_000_000 per copy, and every WORD
gets a per-replica suffix (w -> w_rN). The suffix makes replicas
SHINGLE-DISJOINT, so each copy carries the original corpus's near-dup
structure (248 pairs >= 0.5 at sf0.1) with ZERO cross-copy pairs —
verbatim copies would turn every doc into a 100-member clique and the
pair count quadratic BY CONSTRUCTION, measuring the corpus, not the
operator. With disjoint replicas, linear pair growth is the operator
property under test. Embeddings: vec_id shifts; a tiny per-replica
perturbation (+r*1e-4 on dim 0) keeps vectors distinct without moving
the distribution.

Usage: python3 tools/stage_scale_replicas.py <outBase>
Writes <outBase>/x10/{documents,embeddings}.parquet and x100/...
"""
import os
import sys

import duckdb

out = sys.argv[1]
src = "/root/testdata/sf0.1"

con = duckdb.connect()
for scale in (10, 100):
    d = f"{out}/x{scale}"
    os.makedirs(d, exist_ok=True)
    con.execute(f"""
      COPY (
        SELECT doc_id + r * 10000000 AS doc_id,
               array_to_string(list_transform(string_split(text, ' '),
                 w -> w || '_r' || r), ' ') AS text,
               lang, source,
               CAST(length(array_to_string(list_transform(
                 string_split(text, ' '), w -> w || '_r' || r), ' '))
                 AS BIGINT) AS n_chars
        FROM read_parquet('{src}/documents.parquet'),
             range(0, {scale}) t(r)
      ) TO '{d}/documents.parquet' (FORMAT parquet)
    """)
    con.execute(f"""
      COPY (
        SELECT vec_id + r * 10000000 AS vec_id,
               list_transform(list_concat(
                   [embedding[1] + r * 0.0001], embedding[2:]),
                 x -> CAST(x AS FLOAT)) AS embedding,
               label
        FROM read_parquet('{src}/embeddings.parquet'),
             range(0, {scale}) t(r)
      ) TO '{d}/embeddings.parquet' (FORMAT parquet)
    """)
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{d}/documents.parquet')"
    ).fetchone()[0]
    print(f"x{scale}: {n} docs staged at {d}")
