#!/usr/bin/env python3
"""Dev harness emulating the driver's correctness gate.

Runs each oracle_sql.json entry in DuckDB over the same parquet tables and
compares against the Spark result parquet written by graft.Verify:
columns sorted by name, rows sorted, exact value compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
NOT part of the library — duckdb/pandas are driver-side tools only.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    fails = 0
    for name in sorted(oracle):
        spark_path = Path(out_dir) / name
        if not spark_path.exists():
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM '{spark_path}/*.parquet'").df())
            want = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            fails += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            fails += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            fails += 1
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                bad = (~eq).idxmax()
                diffs.append(f"{c}[row {bad}]: {a[bad]!r} != {b[bad]!r} "
                             f"({int((~eq).sum())} cells)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]))
            fails += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    # keys without oracle = rows-only
    for p in sorted(Path(out_dir).iterdir()):
        if p.is_dir() and p.name not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"ROWS {p.name}: {n} rows (no oracle)")
    print(f"\n{fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
