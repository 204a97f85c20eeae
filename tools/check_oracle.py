#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers every parquet in sfDir as a DuckDB view, runs each entry of
<verifyOutDir>/oracle_sql.json, and compares to the Spark result parquet
at <verifyOutDir>/<name>/ — rows, schema (column names sorted), and a
value hash over column-name-sorted, row-sorted data.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def df_hash(df: pd.DataFrame) -> str:
    df = canon(df)
    # dtype KIND (int vs float vs object) is part of the contract: the
    # driver's comparator distinguishes DuckDB HUGEINT->float64 from
    # Spark int64 even when %.17g prints both as "788" (round-3 lesson:
    # raw sum(BIGINT) in a DuckDB oracle must be CAST back to BIGINT).
    kinds = ",".join(f"{c}:{df[c].dtype.kind}" for c in df.columns)
    payload = (kinds + "\n").encode() + df.to_csv(index=False, float_format="%.17g").encode()
    return hashlib.md5(payload).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    produced = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    # an oracle whose query crashed in Verify leaves no output dir —
    # that is a gate FAILURE, not a skip
    for name in sorted(set(oracles) - produced):
        print(f"{name}: MISSING-OUTPUT (query failed in Verify)")
        n_bad += 1
    for name in sorted(produced):
        d = os.path.join(out_dir, name)
        spark_df = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name not in oracles:
            print(f"{name}: NO-ORACLE rows={len(spark_df)}"
                  + (" [EMPTY!]" if len(spark_df) == 0 else ""))
            continue
        try:
            ora_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            n_bad += 1
            continue
        rows_ok = len(spark_df) == len(ora_df)
        schema_ok = sorted(spark_df.columns) == sorted(ora_df.columns)
        hash_ok = schema_ok and rows_ok and df_hash(spark_df) == df_hash(ora_df)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            n_bad += 1
            print(f"{name}: FAIL rows={rows_ok}({len(spark_df)}/{len(ora_df)}) "
                  f"schema={schema_ok} hash={hash_ok}")
            if not schema_ok:
                print(f"  spark cols: {sorted(spark_df.columns)}")
                print(f"  ora   cols: {sorted(ora_df.columns)}")
            elif rows_ok:
                a, b = canon(spark_df), canon(ora_df)
                diff = (a != b) & ~(a.isna() & b.isna())
                bad_rows = diff.any(axis=1)
                print(a[bad_rows].head(3))
                print(b[bad_rows].head(3))
        else:
            print(f"{name}: OK rows={len(spark_df)}")
    print(f"\n{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
