#!/usr/bin/env python3
"""Bucketed DuckDB oracle for graph_triangles at scales where the
single-pass oracle dies (round-8: the whole-graph CTE spilled >70 GB at
sf1 and was killed — an oracle-ENGINE capacity limit, not an engine
discrepancy).

The heavy stage is the `pairs` CTE (lineitem ⋈ orders ⋈ customer ⋈
supplier, grouped to nation-pair counts). Every lineitem row matches
EXACTLY one order (hence one customer) and one supplier, so bucketing
lineitem by `l_orderkey % K` partitions the count-sum exactly: per-bucket
pair counts summed over buckets equal the one-pass counts. Each bucket's
join fits in a bounded memory budget, the accumulated `pairs` table is at
most 625 rows (25x25 nations), and the remaining graph math (threshold,
undirect, wedge join, per-node counts) is trivial at any sf.

Usage: python3 dev/triangles_bucketed_oracle.py <sfDir> <verifyOutDir> [K]
Compares against <verifyOutDir>/graph_triangles/*.parquet (a graft.Verify
dump) and exits nonzero on mismatch.
"""
import os
import sys

import duckdb


def main(sf_dir, out_dir, k_buckets=16):
    con = duckdb.connect()
    # hard budget: the point of bucketing is that NO stage needs the
    # box's disk — fail fast rather than spill the disk full
    con.execute("SET memory_limit='8GB'")
    for t in ["nation", "customer", "supplier", "orders", "lineitem"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    con.execute(
        "CREATE TABLE pairs_acc (src BIGINT, dst BIGINT, cnt BIGINT)")
    for k in range(k_buckets):
        con.execute(f"""
            INSERT INTO pairs_acc
            SELECT c.c_nationkey, s.s_nationkey, count(*)
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            WHERE l.l_orderkey % {k_buckets} = {k}
            GROUP BY 1, 2""")
        print(f"bucket {k + 1}/{k_buckets} accumulated")

    # identical math to the registered trianglesOracle from here down,
    # with `pairs` re-derived as the bucket sum
    want = con.execute("""
        WITH pairs AS (
          SELECT src, dst, CAST(sum(cnt) AS BIGINT) AS cnt
          FROM pairs_acc GROUP BY 1, 2),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                       CAST(count(*) AS BIGINT) AS npairs FROM pairs),
        ud AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
               FROM pairs, tot
               WHERE cnt * npairs * 10 >= total * 12 AND src <> dst),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM ud e1
                JOIN ud e2 ON e2.a = e1.b
                JOIN ud e3 ON e3.a = e1.a AND e3.b = e2.b),
        pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
               FROM (SELECT x AS node FROM tri
                     UNION ALL SELECT y FROM tri
                     UNION ALL SELECT z FROM tri)
               GROUP BY node)
        SELECT n_name, n_triangles
        FROM pn JOIN nation ON node = n_nationkey
        ORDER BY n_triangles DESC, n_name""").fetchall()

    got = con.execute(
        f"SELECT n_name, n_triangles FROM '{out_dir}/graph_triangles/"
        f"*.parquet' ORDER BY n_triangles DESC, n_name").fetchall()

    if got == want:
        print(f"PASS graph_triangles ({len(got)} rows, "
              f"{k_buckets}-bucket oracle)")
        return 0
    print(f"FAIL graph_triangles: spark={len(got)} rows, "
          f"oracle={len(want)} rows")
    for g, w in zip(got, want):
        if g != w:
            print(f"  first diff: spark={g} oracle={w}")
            break
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 16))
