#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage:
  python3 tools/verify_local.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<name>/ spark parquet result plus
<verify_out_dir>/oracle_sql.json, replays the oracle SQL in DuckDB over the
<sf_dir>/*.parquet tables, and compares with the canonical method: sort
columns by name, sort rows by all columns, astype(str), hash.

This is a DEV TOOL run driver-side (python/duckdb are not available to the
shipped Scala library). It exists because round 1's artifact flagged decimal
dtype hash drift — this replica proves representation stability before the
driver runs.
"""
import glob
import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    s = df.astype(str)
    if len(s.columns):
        s = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
    return s


def frame_hash(s: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(("|".join(s.columns)).encode())
    for row in s.itertuples(index=False):
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle_sql = json.load(f)

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if only:
        names = [n for n in names if n in only]
    failures = []
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files],
                                 ignore_index=True)
        except Exception as exc:
            print(f"FAIL  {name}: cannot read spark result: {exc}")
            failures.append(name)
            continue
        sql = oracle_sql.get(name)
        if sql is None:
            print(f"skip  {name}: no oracle (rows={len(spark_df)})")
            continue
        try:
            oracle_df = con.execute(sql).df()
        except Exception as exc:
            print(f"FAIL  {name}: oracle error: {exc}")
            failures.append(name)
            continue
        try:
            a, b = canon(spark_df), canon(oracle_df)
        except Exception as exc:
            print(f"FAIL  {name}: canonicalize error: {exc}")
            failures.append(name)
            continue
        rows_ok = len(a) == len(b)
        schema_ok = list(a.columns) == list(b.columns)
        hash_ok = rows_ok and schema_ok and frame_hash(a) == frame_hash(b)
        if hash_ok:
            print(f"ok    {name}: rows={len(a)}")
        else:
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)}/{len(b)} schema_ok={schema_ok} "
                  f"spark_cols={list(a.columns)} oracle_cols={list(b.columns)}")
            if rows_ok and schema_ok:
                neq = (a != b).any(axis=1)
                diff = pd.concat([a[neq].head(3).add_suffix("_spark"),
                                  b[neq].head(3).add_suffix("_oracle")], axis=1)
                print(diff.to_string())
    print(f"\n{len(names) - len(failures)}/{len(names)} pass")
    if failures:
        print("failing:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
