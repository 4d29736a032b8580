#!/usr/bin/env python3
"""Authoring-time type gate for the oracle sweep (VERDICT r9 #7): the
driver's correctness compare hashes serialized VALUES, so a DuckDB
result type that differs from the Spark entry's parquet type fails the
hash even when every value is equal — r9's one red row was exactly this
(a raw windowed SUM returning HUGEINT against a parquet BIGINT). This
sweep maps each oracle's DuckDB result schema (via DESCRIBE, no
execution) onto the Verify dump's parquet schema 1:1 and fails fast
with a type-diff message instead of a bare hash mismatch.

Usage: python3 tools/check_oracle_types.py <verifyOutDir> <sfDir> [names]
"""
import json
import os
import re
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# DuckDB type -> the pyarrow type(s) it serializes identically to.
# HUGEINT is deliberately ABSENT: it has no parquet peer and must be
# CAST in the oracle (the house convention).
DUCK_TO_ARROW = {
    "BIGINT": {"int64"},
    "INTEGER": {"int32"},
    "SMALLINT": {"int16"},
    "TINYINT": {"int8"},
    "UBIGINT": {"uint64"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string", "large_string"},
    "BOOLEAN": {"bool"},
    "DATE": {"date32[day]"},
    "BLOB": {"binary", "large_binary"},
    "TIMESTAMP": {"timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp[us, tz=UTC]"},
}


# Per-(entry, column) exceptions: pairs known hash-green despite a type
# gap the global table must NOT absorb. A DuckDB DATE serializes
# identically to a MIDNIGHT timestamp (pandas reads both as
# datetime64[ns]), but widening the global DATE mapping would disable
# date-vs-timestamp checking repo-wide — a future entry returning a
# non-midnight timestamp where the contract says DATE must still flag.
# q_scalar_date's month_start: Spark date_trunc returns TIMESTAMP,
# DuckDB's returns DATE; truncation guarantees midnight, hash-green
# since round 3.
PAIR_EXCEPTIONS = {
    ("q_scalar_date", "month_start"): ("DATE", {"timestamp[us]",
                                                "timestamp[ns]"}),
}


def compatible(duck_t: str, arrow_t: str) -> bool:
    duck_t, arrow_t = duck_t.strip(), str(arrow_t)
    # lists: compare element types (one nesting level is all the
    # entries use)
    if duck_t.endswith("[]"):
        m = re.match(r"(?:large_)?list<(?:element|item): (.+?)(?: not null)?>",
                     arrow_t)
        return bool(m) and compatible(duck_t[:-2], m.group(1))
    return arrow_t in DUCK_TO_ARROW.get(duck_t, set())


def main(out_dir: str, sf_dir: str, names=None) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as fh:
        oracles = json.load(fh)
    fails = 0
    for name in (names or sorted(oracles)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"SKIP {name}: no Verify output")
            continue
        pf = [f for f in os.listdir(d) if f.endswith(".parquet")]
        if not pf:
            print(f"SKIP {name}: empty Verify output")
            continue
        spark_schema = {f.name: str(f.type)
                        for f in pq.read_schema(os.path.join(d, pf[0]))}
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {str(e)[:200]}")
            fails += 1
            continue
        diffs = []
        for col, duck_t, *_ in desc:
            exc = PAIR_EXCEPTIONS.get((name, col))
            excused = (exc is not None and duck_t.strip() == exc[0]
                       and str(spark_schema.get(col)) in exc[1])
            if col not in spark_schema:
                diffs.append(f"{col}: oracle-only column (DuckDB {duck_t})")
            elif excused:
                pass
            elif not compatible(duck_t, spark_schema[col]):
                hint = (" — CAST it in the oracle (house convention)"
                        if duck_t == "HUGEINT" else "")
            # a type that hashes differently at equal values is the
            # r9 false-red class; name both sides
                diffs.append(
                    f"{col}: DuckDB {duck_t} vs parquet "
                    f"{spark_schema[col]}{hint}")
        for col in spark_schema:
            if col not in {c for c, *_ in desc}:
                diffs.append(f"{col}: Spark-only column")
        if diffs:
            print(f"TYPE-DIFF {name}:")
            for x in diffs:
                print(f"  {x}")
            fails += 1
        else:
            print(f"OK {name}")
    print(f"\n{len(names or oracles) - fails} ok / {fails} type-diff")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         sys.argv[3].split(",") if len(sys.argv) > 3 else None)
