#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over an sf dir; print slowest-first.

Usage: python3 tools/time_oracles.py <oracle_sql.json> <sf_dir> [min_sec]
"""
import sys, os, json, time
import duckdb

def main():
    sql_path, sfdir = sys.argv[1], sys.argv[2]
    min_sec = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(sql_path))
    times = []
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchdf()
            dt = time.time() - t0
            times.append((dt, name, ""))
        except Exception as e:
            times.append((time.time() - t0, name, f"ERR {e}"))
    times.sort(reverse=True)
    total = sum(t for t, _, _ in times)
    print(f"TOTAL {total:.1f}s over {len(times)} oracles")
    for dt, name, err in times:
        if dt >= min_sec or err:
            print(f"{dt:8.2f}s  {name}  {err[:120]}")

if __name__ == "__main__":
    main()
