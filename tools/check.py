#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (NOT shipped library code).

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads the parquet dumps written by `sbt "runMain graft.Verify <sfDir> <outDir>"`
plus outDir/oracle_sql.json, runs each oracle SQL in DuckDB over views named
after the driver tables, and compares: columns sorted by name, rows sorted by
all columns, exact value equality (floats compared bitwise, with a fallback
report of max abs diff).
"""
import duckdb, json, math, os, sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    if len(df) > 0:
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(oracle_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if [str(t) for t in s.dtypes] != [str(t) for t in o.dtypes]:
            print(f"WARN {name}: dtypes spark={list(map(str, s.dtypes))} oracle={list(map(str, o.dtypes))}")
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        diff_cols = []
        for c in s.columns:
            a, b = s[c], o[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                try:
                    md = (a - b).abs().max()
                except Exception:
                    md = "n/a"
                diff_cols.append((c, int((~eq).sum()), md))
        if diff_cols:
            print(f"FAIL {name}: value diffs {diff_cols}")
            first = diff_cols[0][0]
            bad = (s[first] != o[first])
            print("  spark:", s[bad].head(3).to_dict("records"))
            print("  oracle:", o[bad].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
