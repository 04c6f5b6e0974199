#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet (Spark side), runs the matching
oracle SQL from oracle_sql.json in DuckDB (with one view per fixture table),
and compares: column names (sorted), row counts, and values (rows sorted by
all columns, NaN-safe). Prints per-query OK/FAIL + a diff sample.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NaN"
        return repr(v)  # shortest round-trip
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = norm_rows(spark_rel.columns, spark_rel.fetchall())
            duck_rel = con.sql(sql)
            d_cols, d_rows = norm_rows(duck_rel.columns, duck_rel.fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
        elif s_rows != d_rows:
            diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}, "
                  f"first diffs: {diffs[:2]}"
                  + (f" spark_only_tail={s_rows[len(d_rows):][:1]}" if len(s_rows) > len(d_rows) else "")
                  + (f" duck_only_tail={d_rows[len(s_rows):][:1]}" if len(d_rows) > len(s_rows) else ""))
            n_fail += 1
        else:
            print(f"OK   {name} ({len(s_rows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} OK, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
