#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify for the
named entries at a given SF dir, execute each entry's oracle SQL in
DuckDB over the same parquet tables, and compare (columns sorted by
name, rows sorted, exact value match)."""
import sys, json, glob, os
import duckdb, pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
fails = 0
for name in (names or sorted(oracle)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        print(f"{name}: MISSING spark output"); fails += 1; continue
    if name not in oracle:
        print(f"{name}: no oracle"); continue
    spark_df = pd.concat([pd.read_parquet(f) for f in
                          sorted(glob.glob(os.path.join(d, "*.parquet")))],
                         ignore_index=True)
    duck_df = con.execute(oracle[name]).df()
    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"{name}: COLUMN MISMATCH {list(a.columns)} vs {list(b.columns)}")
        fails += 1; continue
    if len(a) != len(b):
        print(f"{name}: ROWS {len(a)} vs {len(b)}"); fails += 1; continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=True)
        print(f"{name}: OK ({len(a)} rows)")
    except AssertionError as e:
        print(f"{name}: VALUE MISMATCH\n{str(e)[:500]}"); fails += 1
sys.exit(1 if fails else 0)
