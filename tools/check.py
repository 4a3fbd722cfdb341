#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run graft.Verify
output against the DuckDB oracle SQL, compare rows/schema/values after
sorting columns by name (the driver's documented compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys
from collections import Counter

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Tag every value with its Python type: the driver's hash canonicalization
    # is type-sensitive (Decimal(5) == 5 in Python would mask an engine-level
    # HUGEINT-vs-BIGINT or DECIMAL(38)-vs-DECIMAL(18) divergence — the exact
    # failure class of round 1).
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    return (type(v).__name__, v)


def coltypes(con, rel_name, cols):
    """DuckDB-reported logical type per column, in sorted-column order."""
    desc = con.sql(f"SELECT {', '.join(cols)} FROM {rel_name} LIMIT 0")
    return list(zip(desc.columns, [str(t) for t in desc.types]))


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
            got_types = coltypes(con, "got", got_cols)
            got_rows = Counter(
                tuple(norm(v) for v in row) for row in
                con.sql(f"SELECT {', '.join(got_cols)} FROM got").fetchall())
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_types = coltypes(con, "exp", exp_cols)
            exp_rows = Counter(
                tuple(norm(v) for v in row) for row in
                con.sql(f"SELECT {', '.join(exp_cols)} FROM exp").fetchall())
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols spark={got_cols} duckdb={exp_cols}")
            failures += 1
        elif got_types != exp_types:
            diff = [(g, e) for g, e in zip(got_types, exp_types) if g != e]
            print(f"FAIL {name}: types {diff}")
            failures += 1
        elif got_rows != exp_rows:
            spark_only = list((got_rows - exp_rows).elements())[:3]
            duckdb_only = list((exp_rows - got_rows).elements())[:3]
            print(f"FAIL {name}: rows spark={sum(got_rows.values())}"
                  f" duckdb={sum(exp_rows.values())}"
                  f" spark_only={spark_only} duckdb_only={duckdb_only}")
            failures += 1
        else:
            print(f"OK   {name}: {sum(got_rows.values())} rows")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
