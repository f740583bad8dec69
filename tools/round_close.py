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
import subprocess
import sys
import xml.etree.ElementTree as ET

verify_dir = sys.argv[1]
bench_path = sys.argv[2] if len(sys.argv) > 2 else None

oracle = json.load(open(os.path.join(verify_dir, "oracle_sql.json")))
key_dirs = sorted(
    d for d in os.listdir(verify_dir)
    if os.path.isdir(os.path.join(verify_dir, d)))

# Failure honesty (r6 lesson: 52 thrown keys silently vanished from the
# correctness artifact). graft.Verify now always writes _failed.json;
# its absence means an old/partial Verify run, and any entry in it means
# a declared key produced no output. Both abort the round close.
failed_path = os.path.join(verify_dir, "_failed.json")
if not os.path.exists(failed_path):
    sys.exit("round_close: %s/_failed.json missing — re-run graft.Verify "
             "(pre-r7 output dirs lack the failure manifest)" % verify_dir)
failed = json.load(open(failed_path))
if failed:
    for k, err in sorted(failed.items()):
        print("FAILED %s: %s" % (k, err), file=sys.stderr)
    sys.exit("round_close: %d key(s) threw in graft.Verify — a round "
             "must not close on a partial correctness surface" % len(failed))

# Fixture drift gate (r6 lesson #2: the driver regenerated the fixtures
# mid-round and nothing noticed until the judge did).
drift = subprocess.run(
    [sys.executable, os.path.join(os.path.dirname(__file__),
                                  "fixture_lock.py"), "check"])
if drift.returncode != 0:
    sys.exit("round_close: fixture drift detected — re-verify everything, "
             "then accept with `tools/fixture_lock.py write`")

# Test count methodology: count EXECUTED <testcase> elements — elements
# with a <skipped>/<ignored> child are reported but not run, so the raw
# element count is not guaranteed to equal sbt's "Total number of tests
# run" either (r6 advisor note; the 165-vs-157 gap in the r5 comment did
# not reproduce in the committed reports). One number, one source, and
# the source is executed testcases.
tests = 0
for xf in glob.glob("target/test-reports/*.xml"):
    root = ET.parse(xf).getroot()
    for tc in root.findall(".//testcase"):
        if tc.find("skipped") is None and tc.find("ignored") is None:
            tests += 1

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
    # Bench.scala always writes the full profile and names it in the
    # JSON line; the env var is only an override (r6 advisor medium —
    # the env-var-free flow used to silently omit the median).
    full = os.environ.get("SPARK_GRAFT_BENCH_FULL") or b.get("full_profile")
    if full and os.path.exists(full):
        times = json.load(open(full))
        # "_"-prefixed entries are run metadata (r15: "_loadavg" carries
        # the per-key loadavg sample series), not per-key timings
        vals = [v[0] if isinstance(v, list) else v
                for k, v in times.items() if not k.startswith("_")]
        out["bench_median_sec"] = round(statistics.median(vals), 3)
print(json.dumps(out, sort_keys=True))
