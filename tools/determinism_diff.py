#!/usr/bin/env python3
"""Determinism audit: compare two Verify output dirs query by query.

Usage: python3 tools/determinism_diff.py <dirA> <dirB>

Each query's parquet is loaded, columns sorted by name, rows sorted by all
columns (as strings), and compared cell-for-cell. Any difference marks a
nondeterministic query — one the DuckDB oracle compare might pass by luck
once and fail next round.
"""
import sys, os, glob
import pandas as pd

def load(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True,
                          key=lambda s: s.astype(str))

def main():
    a, b = sys.argv[1], sys.argv[2]
    names = sorted(d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d)))
    bad = 0
    for n in names:
        da, db = load(a, n), load(b, n)
        if da is None or db is None:
            print(f"MISS  {n}: output missing in one run"); bad += 1; continue
        if list(da.columns) != list(db.columns):
            print(f"DIFF  {n}: columns {list(da.columns)} vs {list(db.columns)}")
            bad += 1; continue
        if len(da) != len(db):
            print(f"DIFF  {n}: rows {len(da)} vs {len(db)}"); bad += 1; continue
        eq = all(da[c].astype(str).equals(db[c].astype(str)) for c in da.columns)
        if not eq:
            print(f"DIFF  {n}: cell-level divergence"); bad += 1
        else:
            print(f"OK    {n} ({len(da)} rows)")
    print(f"\n== {len(names) - bad} identical, {bad} DIVERGENT ==")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
