#!/usr/bin/env python3
"""Large-SF ledger oracle pass: same compare as oracle_check.py, but each
query runs in its own subprocess under a wall-clock timeout — DuckDB
replays that are super-linear at 10x (LSH banding unions, prefix joins)
report TIMEOUT instead of stalling the whole pass. A TIMEOUT is a
feasibility statement about the ORACLE at this SF, not a correctness
verdict; every timed-out query stays green in the sf0.01 driver ledger.

Usage: python3 tools/oracle_check_timeout.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import json
import subprocess
import sys

WORKER = r"""
import sys, json
sys.path.insert(0, "tools")
from oracle_check import TABLES, frame, cells
import duckdb
sf_dir, out_dir, name = sys.argv[1:4]
con = duckdb.connect()
for t in TABLES:
    # driver fixtures are single files; Spark-written corpora (TenXCorpus)
    # are part-file directories — glob in that case
    p = f"{sf_dir}/{t}.parquet"
    import os
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
s_df = frame(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
d_df = frame(con.sql(sql))
if list(s_df.columns) != list(d_df.columns):
    print(f"columns spark={list(s_df.columns)} duck={list(d_df.columns)}")
    sys.exit(2)
s_rows, d_rows = cells(s_df), cells(d_df)
if s_rows != d_rows:
    diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
    print(f"rows spark={len(s_rows)} duck={len(d_rows)} first_diff={diffs[:1]}")
    sys.exit(2)
print(len(s_rows))
"""


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    skip = set()
    if len(sys.argv) > 4:
        import os
        if os.path.exists(sys.argv[4]):
            skip = set(open(sys.argv[4]).read().split())
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok, fail, timed = [], [], []
    if skip:
        print(f"(skipping {len(skip)} already-verified)")
    for name in (n for n in sorted(oracles) if n not in skip):
        try:
            r = subprocess.run(
                [sys.executable, "-c", WORKER, sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout)
            if r.returncode == 0:
                print(f"OK      {name} ({r.stdout.strip()} rows)")
                ok.append(name)
            else:
                print(f"FAIL    {name}: {r.stdout.strip()[:300]} {r.stderr.strip()[-300:]}")
                fail.append(name)
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {name} (> {timeout:.0f}s oracle replay)")
            timed.append(name)
    print(f"\n{len(ok)} OK, {len(fail)} FAIL, {len(timed)} TIMEOUT "
          f"(oracle infeasible at this SF within {timeout:.0f}s)")
    if timed:
        print("timeouts:", ",".join(timed))
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
