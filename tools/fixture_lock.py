#!/usr/bin/env python3
"""Fixture fingerprint lock (dev tool only; the engine is pure Scala).

Round-6 lesson: the driver regenerated /root/testdata under the builder's
feet and events.ts silently changed physical type from TIMESTAMP(NANOS)
to TIMESTAMP(MICROS), breaking 52 keys for a full round with no signal.
This records, per table and SF, the parquet footer facts that matter —
column names, arrow types (physical+logical), and row count — plus an
md5 of the file BYTES (r7 verdict #5: a regen preserving schema and row
counts but changing values would still silently shift the no-oracle
golden expectations — minhash signatures, LSH pair sets) into
FIXTURES.lock.json so drift is detected in minutes, not lost in a round.

Usage:
  python3 tools/fixture_lock.py write   # (re)generate FIXTURES.lock.json
  python3 tools/fixture_lock.py check   # exit 1 + diff on any drift

`check` runs from tools/round_close.py at round close and is cheap enough
to run at session start too. On drift the fix is NOT to regenerate the
lock blindly: re-verify every key against the new fixtures first (sbt
test + Verify + check_oracle), then `write` to accept.
"""
import hashlib
import json
import os
import sys

import pyarrow.parquet as pq


def md5_file(path):
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()

TESTDATA = "/root/testdata"
SFS = ["sf0.001", "sf0.01", "sf0.1"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
LOCK = os.path.join(os.path.dirname(__file__), "..", "FIXTURES.lock.json")


def fingerprint():
    out = {}
    for sf in SFS:
        for t in TABLES:
            path = os.path.join(TESTDATA, sf, f"{t}.parquet")
            if not os.path.exists(path):
                out[f"{sf}/{t}"] = "MISSING"
                continue
            md = pq.ParquetFile(path)
            schema = md.schema_arrow
            out[f"{sf}/{t}"] = {
                "columns": {f.name: str(f.type) for f in schema},
                "num_rows": md.metadata.num_rows,
                "md5": md5_file(path),
            }
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    current = fingerprint()
    if mode == "write":
        with open(LOCK, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {os.path.normpath(LOCK)} ({len(current)} entries)")
        return 0
    if not os.path.exists(LOCK):
        print("FIXTURES.lock.json missing — run `fixture_lock.py write` "
              "after verifying the current fixtures", file=sys.stderr)
        return 1
    locked = json.load(open(LOCK))
    drift = []
    for k in sorted(set(locked) | set(current)):
        if locked.get(k) != current.get(k):
            drift.append(k)
            print(f"DRIFT {k}:\n  locked:  {locked.get(k)}\n"
                  f"  current: {current.get(k)}", file=sys.stderr)
    if drift:
        print(f"fixture drift in {len(drift)} table(s) — RE-VERIFY "
              "EVERYTHING (sbt test + Verify + check_oracle at all SFs) "
              "before accepting with `fixture_lock.py write`",
              file=sys.stderr)
        return 1
    print(f"fixtures match lock ({len(current)} entries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
