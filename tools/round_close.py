#!/usr/bin/env python3
"""Machine-derived round-close numbers (dev tool only).

The r4 verdict flagged hand-copied claims drifting (SURVEY said 156 tests,
the reports said 155). This emits the round-close facts from the artifacts
themselves so SURVEY/BASELINE can paste one reproducible JSON line.

Usage: python3 tools/round_close.py <verifyOutDir> [benchJsonPath]

- declared keys + oracle-able count: <verifyOutDir>/oracle_sql.json and
  the per-key result dirs graft.Verify wrote there
- test count: target/test-reports/*.xml (the authoritative per-suite
  JUnit reports sbt writes)
- bench total/median: the one-line JSON from graft.Bench (optional arg)
"""
import glob
import json
import os
import statistics
import sys
import xml.etree.ElementTree as ET

verify_dir = sys.argv[1]
bench_path = sys.argv[2] if len(sys.argv) > 2 else None

oracle = json.load(open(os.path.join(verify_dir, "oracle_sql.json")))
key_dirs = sorted(
    d for d in os.listdir(verify_dir)
    if os.path.isdir(os.path.join(verify_dir, d)))

# Test count methodology (r5 verdict item 3): count <testcase> ELEMENTS,
# not the suite-level `tests` attributes. ScalaTest's XML reporter pads
# the attribute with suite-scoped entries in some suites (r5: attribute
# sum 165 vs "Total number of tests run: 157" from the identical green
# run), while the <testcase> elements are exactly the executed tests the
# run summary counts. One number, one source.
tests = 0
for xf in glob.glob("target/test-reports/*.xml"):
    root = ET.parse(xf).getroot()
    tests += len(root.findall(".//testcase"))

out = {
    "declared_keys": len(key_dirs),
    "oracle_keys": len(oracle),
    "no_oracle_keys": sorted(set(key_dirs) - set(oracle)),
    "tests": tests,
}
if bench_path:
    b = json.load(open(bench_path))
    out["bench_total_sec"] = b.get("value")
    out["bench_n_queries"] = b.get("n_queries")
    out["bench_errors"] = b.get("errors")
    full = os.environ.get("SPARK_GRAFT_BENCH_FULL")
    if full and os.path.exists(full):
        times = json.load(open(full))
        vals = [v[0] if isinstance(v, list) else v for v in times.values()]
        out["bench_median_sec"] = round(statistics.median(vals), 3)
print(json.dumps(out, sort_keys=True))
