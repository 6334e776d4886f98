#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify.scala output.

Mimics the driver's t2 compare: for each query, load the Spark parquet
result and run the oracle SQL in DuckDB over the same testdata tables;
sort columns by name, sort rows, compare values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match a plausible driver float normalization: repr of the double
        return repr(v)
    return repr(v)

def table_key(df):
    cols = sorted(df.columns)
    rows = [tuple(norm(r[df.columns.get_loc(c)]) for c in cols) for r in df.itertuples(index=False)]
    rows.sort()
    return cols, rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_bad += 1; continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_bad += 1; continue
        gc, gr = table_key(got)
        ec, er = table_key(exp)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}"); n_bad += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount spark={len(gr)} oracle={len(er)}"); n_bad += 1; continue
        if gr != er:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: {sum(1 for a,b in zip(gr,er) if a!=b)} differing rows, first: {diffs}")
            n_bad += 1; continue
        print(f"OK   {name} ({len(gr)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
