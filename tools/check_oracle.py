#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
dumped by graft.Verify, run the matching oracle SQL in DuckDB over the same
parquet tables and compare (column names sorted, rows sorted, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [timeoutSec]

With a timeoutSec, each oracle's DuckDB replay is interrupted after that
many seconds and recorded as a named SKIP instead of hanging the sweep —
the documented-quadratic oracles (all-pairs similarity replays) are
exact but not feasible in DuckDB at large SFs, and the named skip list
IS the justified-exclusion record.
"""
import json
import math
import sys
import threading

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b):
    try:
        import pandas as pd
        # covers None, float NaN, and pandas NaT uniformly; isna on
        # non-scalar (list) values raises/returns arrays -> fall through
        if pd.isna(a) is True and pd.isna(b) is True:
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None
    # optional 4th arg: a file of entry names to EXCLUDE (one per line)
    # — resume support for long sf0.1 sweeps (feed it the names already
    # adjudicated by a previous partial run's log)
    exclude = set()
    if len(sys.argv) > 4:
        with open(sys.argv[4]) as f:
            exclude = {l.strip() for l in f if l.strip()}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    oracles = {k: v for k, v in oracles.items() if k not in exclude}

    failures = []
    skipped = []
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')"
            ).df()
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        timer = None
        timed_out = []
        done = []
        if timeout:
            # the completion flag keeps a timer that fires in the gap
            # between execute() returning and cancel() from
            # interrupting the SHARED connection mid-way through the
            # NEXT oracle's query (which would be misattributed)
            def interrupt_if_running():
                if not done:
                    timed_out.append(True)
                    con.interrupt()
            timer = threading.Timer(timeout, interrupt_if_running)
            timer.start()
        try:
            want = con.execute(sql).df()
            done.append(True)
        except Exception as e:
            done.append(True)
            if timed_out:
                skipped.append(name)
                print(f"SKIP  {name}: oracle replay exceeded {timeout:g}s")
                continue
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        finally:
            if timer:
                timer.cancel()
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            failures.append(
                (name, f"columns differ: spark={list(g.columns)} duckdb={list(w.columns)}"))
            continue
        if len(g) != len(w):
            failures.append((name, f"row count differs: spark={len(g)} duckdb={len(w)}"))
            continue
        mismatch = None
        for col in g.columns:
            gv, wv = g[col].tolist(), w[col].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if not values_equal(a, b):
                    mismatch = f"col {col} row {i}: spark={a!r} duckdb={b!r}"
                    break
            if mismatch:
                break
        if mismatch:
            failures.append((name, mismatch))
        else:
            print(f"OK    {name} ({len(g)} rows)")
    for name, why in failures:
        print(f"FAIL  {name}: {why}")
    if skipped:
        print(f"\nskipped (oracle replay over {timeout:g}s): "
              + ",".join(skipped))
    print(f"\n{len(oracles) - len(failures) - len(skipped)}"
          f"/{len(oracles)} queries match"
          + (f" ({len(skipped)} skipped)" if skipped else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
