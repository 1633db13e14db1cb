#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <verifyOutDir> <sfDir>

Reads oracle_sql.json from the Verify dump, runs each SQL in DuckDB
against the sf parquet tables, and compares with the Spark parquet
output: schema (sorted column names), row count, and a hash of the
row-sorted values.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if v is None:
        return "NULL"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_rows(df_cols, rows):
    order = sorted(range(len(df_cols)), key=lambda i: df_cols[i])
    out = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            spark_cols = list(tbl.column_names)
            spark_rows = [tuple(r[c] for c in spark_cols)
                          for r in tbl.to_pylist()]
            res = con.execute(sql)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            if sorted(spark_cols) != sorted(duck_cols):
                print(f"FAIL {name}: cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
                n_fail += 1
                continue
            a = table_rows(spark_cols, spark_rows)
            b = table_rows(duck_cols, duck_rows)
            if len(a) != len(b):
                print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
                n_fail += 1
            elif a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: value mismatch, e.g. {diffs}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(a)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
