#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: check_correctness.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet result, runs the matching
oracle from oracle_sql.json against the sf parquet tables, sorts columns
by name and rows by all values, and compares cell-for-cell.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        gcols, grows = canon(got.fetchall(), got.columns)
        if name not in oracles:
            n_noracle += 1
            print(f"  ~ {name}: no oracle (rows={len(grows)})")
            continue
        try:
            exp = con.sql(oracles[name])
            ecols, erows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            n_fail += 1
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            continue
        if gcols != ecols:
            n_fail += 1
            print(f"  ✗ {name}: schema mismatch got={gcols} exp={ecols}")
            continue
        if len(grows) != len(erows):
            n_fail += 1
            print(f"  ✗ {name}: row count got={len(grows)} exp={len(erows)}")
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
        if bad:
            n_fail += 1
            i, a, b = bad[0]
            print(f"  ✗ {name}: {len(bad)}/{len(grows)} rows differ; first at {i}:")
            print(f"      got {a}")
            print(f"      exp {b}")
        else:
            n_pass += 1
            print(f"  ✓ {name} ({len(grows)} rows)")
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_noracle}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
