#!/usr/bin/env python3
"""Strict mimic of the driver's hash-based gate: sort columns by name,
sort rows, then require dtype match and bit-exact (repr-exact) cells.
Reports the first diff per query with dtypes so type-skew is visible.

Usage: python3 tools/strictcheck.py <sfDir> <verifyOutDir> [query...]
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cell_repr(v):
    if v is None:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

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
        dtw = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
               if str(got[c].dtype) != str(exp[c].dtype)]
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = cell_repr(got[c].iloc[i]), cell_repr(exp[c].iloc[i])
                if a != b:
                    bad = (i, c, a, b); break
            if bad: break
        if bad or dtw:
            fails += 1
            msg = f"FAIL {name}:"
            if dtw: msg += f" dtypes {dtw}"
            if bad: msg += f" row {bad[0]} col {bad[1]}: got={bad[2]!r} exp={bad[3]!r}"
            print(msg)
        else:
            print(f"OK   {name}: {len(got)} rows")
    print("RESULT:", "PASS" if fails == 0 else f"{fails} FAILURES")
    sys.exit(1 if fails else 0)

main()
