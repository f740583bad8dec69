#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only; the
engine itself is pure Scala/Spark).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--exact]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
SQL in DuckDB over views named after the parquet tables in <sfDir>, loads
the Spark-side result parquet from <verifyOutDir>/<name>/, then compares:
columns sorted by name, rows sorted by all columns, exact match for
non-floats, 1e-9-relative for floats — or bit-exact float equality with
--exact (the whole suite passes --exact as of round 1). Exits nonzero on
any mismatch.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def array_cols(df: pd.DataFrame):
    """Columns holding list/ndarray cells — the external gate's generic
    sort/hash compare cannot handle them (round-1 errors), so declared
    queries must never emit them; flag instead of masking."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object and len(df) and any(
                isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
                for v in df[c]):
            bad.append(c)
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except Exception:
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str),
                            kind="mergesort")
    return df.reset_index(drop=True)


EXACT = False


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        if EXACT:
            return fa == fb
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame):
    bad = array_cols(spark_df) + array_cols(oracle_df)
    if bad:
        return f"ARRAY-TYPED COLUMNS {sorted(set(bad))} (unsortable in driver gate)"
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"COLUMNS spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        # int-vs-float dtype split (e.g. DuckDB HUGEINT -> float64 vs
        # Spark int64) hash-mismatches in the driver's strict gate even
        # when values are numerically equal
        ak, bk = a[c].dtype.kind, b[c].dtype.kind
        if {ak, bk} == {"i", "f"} or {ak, bk} == {"u", "f"}:
            return f"DTYPE col={c} spark={a[c].dtype} oracle={b[c].dtype}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not values_equal(x, y):
                return f"VALUE col={c} row={i} spark={x!r} oracle={y!r}"
    return None


def main():
    global EXACT
    if "--exact" in sys.argv:
        EXACT = True
        sys.argv.remove("--exact")
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_sql = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures, passed, skipped = [], 0, 0
    for name in sorted(oracle_sql):
        sql = oracle_sql[name]
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            failures.append((name, "NO SPARK OUTPUT (query failed in Verify)"))
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"ORACLE SQL ERROR: {e}"))
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(res_dir.glob("*.parquet"))],
                ignore_index=True)
        except Exception as e:
            failures.append((name, f"SPARK PARQUET READ ERROR: {e}"))
            continue
        err = compare(name, spark_df, oracle_df)
        if err:
            failures.append((name, err))
        else:
            passed += 1
    no_oracle = [d.name for d in Path(out_dir).iterdir()
                 if d.is_dir() and d.name not in oracle_sql]
    for name, err in failures:
        print(f"FAIL {name}: {err}")
    print(f"\n{passed} passed, {len(failures)} failed, "
          f"{len(no_oracle)} no-oracle ({sorted(no_oracle)})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
