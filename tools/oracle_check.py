#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dump <outDir>/<name>/ (parquet) and its SQL in
<outDir>/oracle_sql.json: run the SQL in DuckDB with views named after the
TESTDATA tables, then compare row count, column names, and sorted values.
Dev tool only — the shipped library has no Python dependency.
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items()
                  if k in only or k.split("_")[0] in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = sorted(
                tuple(canon(v) for _, v in sorted(zip(exp.columns, row)))
                for row in exp.fetchall())
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = sorted(
                tuple(canon(v) for _, v in sorted(zip(got.columns, row)))
                for row in got.fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {str(e)[:200]}")
            n_fail += 1
            continue
        if exp_cols != got_cols:
            print(f"FAIL {name}: cols oracle={exp_cols} spark={got_cols}")
            n_fail += 1
        elif exp_rows != got_rows:
            diff = [(a, b) for a, b in zip(exp_rows, got_rows) if a != b]
            print(f"FAIL {name}: rows oracle={len(exp_rows)} spark={len(got_rows)}"
                  f" first_diffs={diff[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
