#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet (Spark side), runs the matching
oracle SQL from oracle_sql.json in DuckDB (with one view per fixture table),
and compares THE WAY THE DRIVER DOES (VERDICT r9 "What's wrong" #6): both
sides go through pandas (`rel.df()`), columns sorted by name, rows sorted by
`DataFrame.sort_values` over all columns, then cells stringified AFTER
pandas dtype coercion. Consequences this deliberately reproduces:
  - DuckDB HUGEINT (uncast window sums, `//` on HUGEINT) lands as float64
    in pandas, so `2.0` vs Spark's int64 `2` FAILS here, as at the driver;
  - Array/Map/Struct output columns make `sort_values` RAISE, so a complex
    driver-facing projection fails loudly here first (round-3 lesson).
Prints per-query OK/FAIL + a diff sample.
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def frame(rel):
    """Mirror the driver: pandas coercion first, then sort columns by name
    and rows by all columns (raises on unsortable/complex dtypes)."""
    df = rel.df()
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def cells(df):
    """Stringify AFTER pandas coercion — dtype drift (int64 vs float64)
    must show, exactly as it does in the driver's hash."""
    return [tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)]


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
            s_df = frame(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            d_df = frame(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        s_cols, d_cols = list(s_df.columns), list(d_df.columns)
        s_rows, d_rows = cells(s_df), cells(d_df)
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
