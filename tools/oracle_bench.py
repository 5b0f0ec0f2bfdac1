#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the denominator of the 2x bench gate.

Usage: python3 tools/oracle_bench.py <sfdir> <oracle_sql.json>
Runs every oracle SQL entry over the testdata views, fully fetching each
result, and prints per-query seconds plus the total. Run back-to-back with
`graft.Bench` on the same idle machine for an apples-to-apples ratio.
"""
import json, sys, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# graft.Bench excludes these from its timed loop (trainer/drill machinery,
# not queries) — skip them here too so the ratio stays apples-to-apples.
BENCH_EXCLUDED = {"q53b_wordcount_store", "q107_bpe_merges"}

def main(sfdir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    total = 0.0
    times = {}
    for name, sql in sorted(oracle.items()):
        if name in BENCH_EXCLUDED:
            continue
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            print(f"ERR {name}: {e}")
            continue
        dt = time.time() - t0
        times[name] = dt
        total += dt
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:10]:
        print(f"{dt:8.2f}s  {name}")
    # per-query times ride in the JSON line so graft.Bench can land a
    # duck_queries map in BENCH_SELF.json — a judge can then name the
    # weak queries by same-window RATIO instead of by wall-time
    print(json.dumps({"metric": "oracle_total", "value": total, "unit": "sec",
                      "n": len(times), "sf": sfdir,
                      "queries": {k: round(v, 4) for k, v in sorted(times.items())}}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
