#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle SQL, compare rows/schema/values after
sorting columns by name (the driver's documented compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = sorted(
                [tuple(norm(v) for v in row) for row in
                 con.sql(f"SELECT {', '.join(got_cols)} FROM got").fetchall()])
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = sorted(
                [tuple(norm(v) for v in row) for row in
                 con.sql(f"SELECT {', '.join(exp_cols)} FROM exp").fetchall()])
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols spark={got_cols} duckdb={exp_cols}")
            failures += 1
        elif got_rows != exp_rows:
            diff = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e]
            print(f"FAIL {name}: rows spark={len(got_rows)} duckdb={len(exp_rows)}"
                  f" first_diffs={diff[:3]}"
                  f" spark_only={[r for r in got_rows if r not in exp_rows][:2]}"
                  f" duckdb_only={[r for r in exp_rows if r not in got_rows][:2]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got_rows)} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
