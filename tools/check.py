#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads <out>/<name>/ parquet (Spark results) and <out>/oracle_sql.json,
runs each oracle in DuckDB over the sf_dir parquet tables (bare names),
sorts columns by name + rows, and compares cell-by-cell. Reports exact
matches, tolerance-only matches (float jitter — fix those!), and hard
mismatches.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # decimals -> float for comparison display; keep object for exactness test
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

def cmp_frames(a, b):
    """returns (exact, close, msg)"""
    if sorted(a.columns) != sorted(b.columns):
        return False, False, f"schema mismatch: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return False, False, f"row count: spark={len(a)} oracle={len(b)}"
    a, b = canon(a), canon(b)
    exact = True
    close = True
    msgs = []
    for c in a.columns:
        av, bv = a[c], b[c]
        astr = av.astype(str); bstr = bv.astype(str)
        if astr.equals(bstr):
            continue
        exact = False
        try:
            af = av.astype(float); bf = bv.astype(float)
            both_nan = af.isna() & bf.isna()
            ok = np.isclose(af.fillna(0), bf.fillna(0), rtol=1e-9, atol=1e-9) | both_nan
            if ok.all():
                msgs.append(f"col {c}: close-but-not-exact ({int((~(astr==bstr)).sum())} cells)")
                continue
            bad = (~ok).idxmax()
            msgs.append(f"col {c}: MISMATCH e.g. row {bad}: spark={av[bad]!r} oracle={bv[bad]!r}")
            close = False
        except (ValueError, TypeError):
            bad = (astr != bstr).idxmax()
            msgs.append(f"col {c}: MISMATCH e.g. row {bad}: spark={av[bad]!r} oracle={bv[bad]!r}")
            close = False
    return exact, close, "; ".join(msgs)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted([d for d in os.listdir(outdir)
                    if os.path.isdir(os.path.join(outdir, d))])
    n_exact = n_close = n_bad = n_noracle = 0
    # Per-query verdicts STREAM to <outdir>/correctness_partial.json as
    # they complete (atomic rename per update): a budget-killed compare
    # leaves an adjudicable partial file, never an empty artifact (the
    # CORRECTNESS_r16 == {} failure mode).
    verdicts = {}
    partial_path = os.path.join(outdir, "correctness_partial.json")
    def flush():
        tmp = partial_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(verdicts, f)
        os.replace(tmp, partial_path)
    import time
    for name in names:
        t0 = time.time()
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL  {name}: no spark output", flush=True); n_bad += 1
            verdicts[name] = {"status": "fail", "msg": "no spark output"}
            flush(); continue
        if name not in oracles:
            status = "ROWS " if len(spark_df) > 0 else "EMPTY"
            print(f"{status} {name}: no oracle, rows={len(spark_df)}",
                  flush=True)
            n_noracle += 1
            verdicts[name] = {"status": "rows_only", "rows": len(spark_df)}
            flush(); continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}", flush=True)
            n_bad += 1
            verdicts[name] = {"status": "fail",
                              "msg": f"oracle SQL error: {e}"[:400]}
            flush(); continue
        exact, close, msg = cmp_frames(spark_df, odf)
        dt = time.time() - t0
        if exact:
            print(f"OK    {name} ({len(spark_df)} rows, {dt:.1f}s)",
                  flush=True)
            n_exact += 1
            verdicts[name] = {"status": "exact", "rows": len(spark_df),
                              "sec": round(dt, 2)}
        elif close:
            print(f"CLOSE {name}: {msg}", flush=True); n_close += 1
            verdicts[name] = {"status": "close", "msg": msg[:400]}
        else:
            print(f"FAIL  {name}: {msg}", flush=True); n_bad += 1
            verdicts[name] = {"status": "fail", "msg": msg[:400]}
        flush()
    print(f"\n== {n_exact} exact, {n_close} close, {n_bad} FAIL, {n_noracle} rows-only ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
