#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the parquet tables
in <sfDir>, sorts columns by name and rows by all values, and compares.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for compare: decimals -> str, floats -> repr
    for c in df.columns:
        df[c] = df[c].map(lambda v: None if pd.isna(v) else str(v))
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob
    names = sorted(x.split("/")[-1] for x in glob.glob(f"{out_dir}/*") if not x.endswith(".json"))
    for name in names:
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            if len(got) == 0:
                print(f"  FAIL: empty result")
                failures += 1
            continue
        want = con.sql(oracle[name]).df()
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns differ spark={list(g.columns)} duck={list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: rowcount spark={len(g)} duck={len(w)}")
            failures += 1
            continue
        if not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            print(f"[FAIL] {name}: {bad.sum()} differing rows; first diffs:")
            merged = pd.concat([g[bad].head(3).add_prefix("spark_"),
                                w[bad].head(3).add_prefix("duck_")], axis=1)
            print(merged.to_string())
            failures += 1
        else:
            print(f"[ok] {name}: {len(g)} rows hash-equal")
    print(f"\n{len(names) - failures}/{len(names)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
