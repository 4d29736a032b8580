#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: run graft.Verify
output (parquet per query + oracle_sql.json) against DuckDB on the same
scale factor, compare rows/schema/values with columns sorted by name.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracles = json.load(fh)
    n_pass = n_fail = n_none = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"MISSING {name}: no Verify output ({e})")
            n_fail += 1
            continue
        try:
            ora_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        s, o = normalize(spark_df), normalize(ora_df)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name}: {len(s)} rows")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:300]}")
            n_fail += 1
    no_oracle = [n for n in
                 sorted(set(p.name for p in __import__('pathlib').Path(out_dir).iterdir()
                            if p.is_dir()))
                 if n not in oracles]
    n_none = len(no_oracle)
    print(f"\n{n_pass} pass / {n_fail} fail / {n_none} no_oracle: {no_oracle}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
