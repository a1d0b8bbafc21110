#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify output
parquet + oracle_sql.json, run each oracle in DuckDB over the same
sf dir, sort columns by name + rows, and compare values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cells_equal(a, b):
    if a is None and b is None: return True
    try:
        if pd.isna(a) and pd.isna(b): return True
        if pd.isna(a) != pd.isna(b): return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try: return float(a) == float(b) or (math.isnan(float(a)) and math.isnan(float(b)))
        except (TypeError, ValueError): return False
    return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = norm(con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns got={list(got.columns)} exp={list(exp.columns)}"); fails += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}"); fails += 1; continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cells_equal(got[c].iloc[i], exp[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], exp[c].iloc[i]); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: got={bad[2]!r} exp={bad[3]!r}"); fails += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print("RESULT:", "PASS" if fails == 0 else f"{fails} FAILURES")
    sys.exit(1 if fails else 0)

main()
