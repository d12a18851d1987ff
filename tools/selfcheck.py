#!/usr/bin/env python3
"""Self-check harness: mimic the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

For each query in <verifyOutDir>/oracle_sql.json: run the oracle SQL in
DuckDB with views named after the parquet tables in <sfDir>, load the Spark
result parquet, sort columns by name, sort rows, and compare values.
This is a builder-side approximation of CORRECTNESS_r{N}.json.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    import datetime

    def norm_dt(v):
        if isinstance(v, pd.Timestamp) and v == v.normalize():
            return v.date()
        return v

    a, b = norm_dt(a), norm_dt(b)
    if isinstance(a, datetime.date) and isinstance(b, datetime.date):
        return a == b
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-12)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Resource knobs for big-fixture replays (the 10x gate): the heavy
    # oracles spill far less with few threads + insertion order off, and
    # the spill must land on the big mount, not a worker cwd.
    if os.environ.get("SELFCHECK_THREADS"):
        con.execute(f"SET threads={int(os.environ['SELFCHECK_THREADS'])}")
        con.execute("SET preserve_insertion_order=false")
    if os.environ.get("SELFCHECK_TEMP"):
        con.execute(f"SET temp_directory='{os.environ['SELFCHECK_TEMP']}'")
    for t in TABLES:
        # Driver testdata ships single-file tables; replicated fixtures
        # (tools.Replicate) use Spark directory output — glob those.
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            expect = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        if list(expect.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
            n_fail += 1
            continue
        if len(expect) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
            n_fail += 1
            continue
        # The driver's hash compare renders values: an int64 column on one
        # side vs float64 on the other ("100" vs "100.0") hash-mismatches
        # even when numerically equal (e.g. DuckDB SUM(BIGINT) -> HUGEINT
        # -> pandas float64). values_equal() is float-tolerant and would
        # mask it, so flag dtype-kind divergence on null-free columns.
        kind_bad = None
        for c in expect.columns:
            ek, gk = expect[c].dtype.kind, got[c].dtype.kind
            if ek != gk and {ek, gk} <= {"i", "u", "f"} and "f" in {ek, gk} \
                    and not expect[c].isna().any() and not got[c].isna().any():
                kind_bad = (c, expect[c].dtype, got[c].dtype)
                break
        if kind_bad:
            c, ed, gd = kind_bad
            print(f"FAIL {name}: col {c} dtype oracle={ed} spark={gd} "
                  "(int-vs-float render diverges in the driver hash)")
            n_fail += 1
            continue
        bad = None
        for c in expect.columns:
            ev, gv = expect[c].tolist(), got[c].tolist()
            for i, (x, y) in enumerate(zip(ev, gv)):
                if not values_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={x!r} spark={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
