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
# top-level so a missing dependency fails fast at startup, not only on
# outputs that happen to carry nested int/double columns (ADVICE r10)
import numpy as np

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
    # driver-hash hazard audit (round 9): the driver's canonicalization of
    # wide types has sharp edges THIS checker's float-repr compare can't
    # see — ref_replica_checksums passed here for 3 rounds while its
    # DECIMAL(38,0) checksums (>2^53) failed the driver's hash. Gate the
    # OUTPUT SCHEMAS: no decimal of any width (values beyond 2^53 corrupt
    # under any float64 canonicalization; emit BIGINT/DOUBLE/STRING), no
    # float32 (widening to float64 is reader-dependent), and no BIGINT
    # whose observed |value| exceeds 2^53 (same corruption risk, reached
    # the honest way).
    def max_abs_int(v):
        # recursive max |int| over scalars and nested lists/arrays/structs,
        # so BIGINT[] and STRUCT(.. BIGINT) columns are value-checked too
        if v is None:
            return 0
        if isinstance(v, (bool, float, np.floating)):
            return 0
        if isinstance(v, (int, np.integer)):
            return abs(int(v))
        if isinstance(v, dict):
            return max((max_abs_int(x) for x in v.values()), default=0)
        if isinstance(v, (list, tuple, np.ndarray)):
            return max((max_abs_int(x) for x in v), default=0)
        return 0

    def has_nonfinite(v):
        # recursive NaN/Inf detector for DOUBLEs nested in STRUCT/LIST —
        # the shapes the SQL isnan/isinf aggregate below can't reach
        if v is None:
            return False
        if isinstance(v, (float, np.floating)):
            return not math.isfinite(v)
        if isinstance(v, dict):
            return any(has_nonfinite(x) for x in v.values())
        if isinstance(v, (list, tuple, np.ndarray)):
            return any(has_nonfinite(x) for x in v)
        return False


    n_hazard = 0
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            continue
        # substring match so hazard types nested in STRUCT(...)/LIST(...)
        # are caught: DESCRIBE renders e.g. 'STRUCT(x FLOAT)', 'DECIMAL[]'
        # independent membership tests (not elif): a STRUCT(n BIGINT,
        # x DOUBLE) column needs BOTH the int bound and the double check
        int_cols, dbl_cols, nested_dbl_cols = [], [], []
        for col, typ in con.execute(
                f"SELECT column_name, column_type FROM "
                f"(DESCRIBE SELECT * FROM '{p}/*.parquet')").fetchall():
            t = typ.upper()
            if ("DECIMAL" in t or "FLOAT" in t or "REAL" in t
                    or "HUGEINT" in t):
                print(f"HAZARD {name}.{col}: {typ} (driver-hash-unsafe "
                      f"output type — normalize to BIGINT/DOUBLE/STRING)")
                n_hazard += 1
                continue
            if "BIGINT" in t:
                int_cols.append(col)
            if t in ("DOUBLE", "DOUBLE[]"):
                dbl_cols.append((col, t))
            elif "DOUBLE" in t:
                # DOUBLE nested in STRUCT(...) or deeper lists: checked
                # value-by-value in python below (the SQL aggregate can't
                # reach inside arbitrary nesting) — a real check, not the
                # former advisory WARN that let nested NaN pass the gate
                nested_dbl_cols.append(col)
        if int_cols:
            # one scan per directory, int columns only, via fetchall():
            # cursor rows carry exact python ints (None for NULL, lists/
            # dicts for nested) — fetchdf would convert a NULLABLE int64
            # column to float64 and corrupt >2^53 values BEFORE the check
            # sees them, silently neutralizing the gate
            # chunked cursor iteration (ADVICE r10): bounded memory at any
            # scale factor instead of materializing every row at once
            sel = ", ".join(f'"{c}"' for c in int_cols)
            cur = con.execute(f"SELECT {sel} FROM '{p}/*.parquet'")
            mxs = [0] * len(int_cols)
            while True:
                chunk = cur.fetchmany(10_000)
                if not chunk:
                    break
                for i in range(len(int_cols)):
                    mxs[i] = max(mxs[i],
                                 max((max_abs_int(r[i]) for r in chunk),
                                     default=0))
            for col, mx in zip(int_cols, mxs):
                if mx > 2 ** 53:
                    print(f"HAZARD {name}.{col}: integer value {mx} exceeds "
                          f"float64-exact range (2^53)")
                    n_hazard += 1
        if dbl_cols:
            # NaN/Inf agree between engines when both COMPUTE them, so the
            # value compare passes — but the driver's canonicalization may
            # render them differently between a parquet read and a DuckDB
            # fetch (the ref_replica_checksums trap shape). Outputs must
            # be finite-or-NULL; operators emit NULL for undefined
            # results. Checked in SQL (isnan on NULL is NULL, so NULLs
            # pass) — fetchdf would conflate NULL with NaN. One combined
            # aggregate = one scan per directory.
            aggs = ", ".join(
                (f'max(isnan("{c}") OR isinf("{c}"))' if t == "DOUBLE" else
                 f'max(list_max(list_transform("{c}", '
                 f'x -> CASE WHEN isnan(x) OR isinf(x) THEN 1 ELSE 0 END))'
                 f' = 1)')
                for c, t in dbl_cols)
            flags = con.execute(
                f"SELECT {aggs} FROM '{p}/*.parquet'").fetchone()
            for (c, _), nf in zip(dbl_cols, flags):
                if nf:
                    print(f"HAZARD {name}.{c}: NaN/Inf value (emit NULL "
                          f"for undefined results — canonicalization-"
                          f"unsafe)")
                    n_hazard += 1
        if nested_dbl_cols:
            # fetchall keeps NULL as None and nested values as dicts/lists,
            # so NaN/Inf inside STRUCT/LIST nesting is actually visible
            # chunked cursor iteration (ADVICE r10): bounded memory at any
            # scale factor or struct width; early exit once every column
            # is already flagged
            sel = ", ".join(f'"{c}"' for c in nested_dbl_cols)
            cur = con.execute(f"SELECT {sel} FROM '{p}/*.parquet'")
            flagged = [False] * len(nested_dbl_cols)
            while not all(flagged):
                chunk = cur.fetchmany(10_000)
                if not chunk:
                    break
                for i in range(len(nested_dbl_cols)):
                    if not flagged[i]:
                        flagged[i] = any(has_nonfinite(r[i]) for r in chunk)
            for col, bad in zip(nested_dbl_cols, flagged):
                if bad:
                    print(f"HAZARD {name}.{col}: NaN/Inf inside nested "
                          f"DOUBLE (emit NULL for undefined results — "
                          f"canonicalization-unsafe)")
                    n_hazard += 1
    if n_hazard:
        print(f"{n_hazard} HAZARD column(s) — driver hash may corrupt them")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_hazard} hazard")
    return 1 if (n_fail or n_hazard) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
