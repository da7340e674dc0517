#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against a Verify dump.

Mimics the driver's correctness gate: for each query, load the Spark
result parquet (written by graft.Verify) and run the oracle SQL in DuckDB
over the same sf tables; sort columns by name, sort rows, compare values
exactly (floats bit-exact, with a tiny report of first mismatches).

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir> [query ...]
"""
import json, math, sys

import duckdb


def norm(v):
    if isinstance(v, float):
        # bit-exact float compare, but normalize -0.0/NaN representation
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0 but str()s differently: keep row sort keys aligned
        return v
    return v


def rows_key(row):
    return tuple(str(x) for x in row)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    failures = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        con = duckdb.connect()
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            failures.append((name, f"spark result missing: {e}"))
            continue
        wc, gc = sorted(want.columns), sorted(got.columns)
        if wc != gc:
            failures.append((name, f"schema mismatch: spark={gc} oracle={wc}"))
            continue
        if len(want) != len(got):
            failures.append((name, f"rows mismatch: spark={len(got)} oracle={len(want)}"))
            continue
        w = sorted((tuple(norm(v) for v in r) for r in want[wc].itertuples(index=False)), key=rows_key)
        g = sorted((tuple(norm(v) for v in r) for r in got[gc].itertuples(index=False)), key=rows_key)
        bad = [(a, b) for a, b in zip(w, g) if a != b][:3]
        if bad:
            failures.append((name, f"value mismatch, first: oracle={bad[0][0]} spark={bad[0][1]}"))
        else:
            print(f"  ok  {name} ({len(got)} rows)")
    for name, msg in failures:
        print(f"FAIL  {name}: {msg}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
