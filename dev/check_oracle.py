#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only — the
Scala engine has no Python dependency).

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>

Replicates the driver's check: for each SparkEntry.queries result dumped by
graft.Verify, run the corresponding oracle SQL in DuckDB over the same
parquet tables and compare row count, column names, and values (rows sorted,
columns sorted by name — plus an order-sensitive check since the driver's
exact hashing discipline is unknown).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — bitwise-ish compare
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        # harness testdata ships single parquet FILES; ScaleGen-derived
        # dirs (dev scale sweeps) are Spark-written DIRECTORIES of parts
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            problems.append(f"columns: spark={gcols} duck={wcols}")
        elif len(got) != len(want):
            problems.append(f"rows: spark={len(got)} duck={len(want)}")
        else:
            g = got[gcols].values.tolist()
            w = want[wcols].values.tolist()
            gs = sorted(tuple(canon(v) for v in r) for r in g)
            ws = sorted(tuple(canon(v) for v in r) for r in w)
            if gs != ws:
                diff = next(i for i, (a, b) in enumerate(zip(gs, ws)) if a != b)
                problems.append(
                    f"values(sorted): first diff at {diff}:\n"
                    f"    spark={gs[diff]}\n    duck ={ws[diff]}")
            else:
                go = [tuple(canon(v) for v in r) for r in g]
                wo = [tuple(canon(v) for v in r) for r in w]
                if go != wo:
                    problems.append("ROW ORDER differs (set equal)")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # queries without oracle: rows-only
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            n = len(con.execute(f"SELECT * FROM '{p}/*.parquet'").fetchdf())
            print(f"INFO {name}: no oracle, {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
