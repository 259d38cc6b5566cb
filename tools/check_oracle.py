#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

Reads <verify_outdir>/oracle_sql.json (written by graft.Verify), runs each
SQL in DuckDB against the parquet tables in <sfdir>, loads the engine's
parquet result from <verify_outdir>/<name>/, sorts columns by name and rows
by all columns, and diffs values exactly (with a float report on mismatch).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return str(a) == str(b)


def main() -> None:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = canon(con.sql(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            actual = canon(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: engine result unreadable: {e}")
            n_fail += 1
            continue
        if list(expected.columns) != list(actual.columns):
            print(f"FAIL {name}: columns {list(actual.columns)} != "
                  f"{list(expected.columns)}")
            n_fail += 1
            continue
        if len(expected) != len(actual):
            print(f"FAIL {name}: rows {len(actual)} != {len(expected)}")
            n_fail += 1
            continue
        bad = []
        for col in expected.columns:
            ev, av = expected[col].tolist(), actual[col].tolist()
            for i, (e, a) in enumerate(zip(ev, av)):
                if not cell_eq(e, a):
                    bad.append((col, i, e, a))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, e.g.:")
            for col, i, e, a in bad:
                print(f"   [{col}][row {i}] oracle={e!r} engine={a!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(expected)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
