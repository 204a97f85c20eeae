#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB with views registered for
every test table, and compares: column names (sorted), row count, and
exact values (with a report of first diffs). Exit code 1 on any mismatch.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # Decimal -> exact string; dates/timestamps -> isoformat
    t = type(v).__name__
    if t == "Decimal":
        return str(v.normalize())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def values_equal(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = []
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
        except Exception as e:
            failures.append((name, f"read spark output failed: {e}"))
            continue
        try:
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            failures.append((name, f"oracle sql failed: {e}"))
            continue

        if sorted(s_cols) != sorted(o_cols):
            failures.append(
                (name, f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"))
            continue
        if len(s_rows) != len(o_rows):
            failures.append(
                (name, f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"))
            continue
        # reorder spark columns to oracle order via name mapping
        idx = [s_cols.index(c) for c in o_cols]
        bad = 0
        first = None
        for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
            srow = tuple(sr[j] for j in idx)
            for c, (a, b) in enumerate(zip(srow, orow)):
                if not values_equal(a, b):
                    bad += 1
                    if first is None:
                        first = f"row {i} col {o_cols[c]}: spark={a!r} oracle={b!r}"
                    break
        if bad:
            failures.append((name, f"{bad}/{len(s_rows)} rows differ; first: {first}"))
        else:
            print(f"OK   {name}  ({len(s_rows)} rows)")

    # queries without oracle: report rows-only status
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracles:
            try:
                n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
                print(f"ROWS {d}  ({n} rows, no oracle)")
            except Exception as e:
                failures.append((d, f"rows-only read failed: {e}"))

    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(oracles) - len([f for f in failures if f[0] in oracles])}/{len(oracles)} oracle checks passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
