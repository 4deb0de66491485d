#!/usr/bin/env python3
"""Dtype-sensitive replica of the driver's pandas-hash compare.

Usage: python3 tools/driver_check.py <sfDir> <verifyOutDir> [names...]

Unlike oracle_check.py (sorted-value string compare), this mimics the
driver harness: load both result sets into pandas, sort columns by name,
sort rows with DataFrame.sort_values (crashes on ndarray cells, exactly
like the driver), then hash with pandas.util.hash_pandas_object — which is
dtype-sensitive, so a DuckDB HUGEINT vs Spark bigint, or a decimal(38,0)
object column vs int64, FAILS here even when values match. This is the
check that caught q132/q141/q150/q161/q162 in round 5.

Dev tool only — the shipped library has no Python dependency.
"""
import json, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def hash_df(df):
    return pd.util.hash_pandas_object(df, index=False).sum()


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
            exp = norm(con.sql(sql).df())
            got = norm(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: exception {str(e)[:200]}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: cols oracle={list(exp.columns)}"
                  f" spark={list(got.columns)}")
            n_fail += 1
        elif len(exp) != len(got):
            print(f"FAIL {name}: rows oracle={len(exp)} spark={len(got)}")
            n_fail += 1
        elif hash_df(exp) != hash_df(got):
            # surface the dtype story — this is almost always the cause
            dt = [(c, str(exp[c].dtype), str(got[c].dtype))
                  for c in exp.columns if exp[c].dtype != got[c].dtype]
            neq = (exp.astype(str) != got.astype(str)).any(axis=1)
            print(f"FAIL {name}: hash mismatch; dtype diffs={dt}"
                  f" value-diff rows={int(neq.sum())}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
