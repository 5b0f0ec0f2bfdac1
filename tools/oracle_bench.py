#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the denominator of the 2x bench gate.

Usage: python3 tools/oracle_bench.py <sfdir> <oracle_sql.json> [--serve]

Batch mode runs every oracle SQL entry over the testdata views, fully
fetching each result, and prints per-query seconds plus the total.

Serve mode (--serve) is the INTERLEAVED pairing face (graft.Bench drives
it): query names arrive one per stdin line, each is timed immediately and
answered as one JSON line, so every DuckDB measurement lands back-to-back
with its Spark twin in the same machine window — duck totals measured as
one post-hoc batch swung 67.7->124.5s across identical suites in r13
(page-cache / VM-window drift), making single-window ratios
uninterpretable. A repeated name keeps the MIN (the same rep discipline
as the Spark side). "EXIT" or EOF ends the session with the same
oracle_total summary line batch mode prints.
"""
import json, sys, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# graft.Bench excludes these from its timed loop (trainer/drill machinery,
# not queries) — skip them here too so the ratio stays apples-to-apples.
BENCH_EXCLUDED = {"q53b_wordcount_store", "q107_bpe_merges"}

def connect(sfdir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return con, json.load(open(oracle_path))


def summary(times):
    print(json.dumps({"metric": "oracle_total",
                      "value": sum(times.values()), "unit": "sec",
                      "n": len(times),
                      "queries": {k: round(v, 4) for k, v in sorted(times.items())}}),
          flush=True)


def serve(sfdir, oracle_path):
    con, oracle = connect(sfdir, oracle_path)
    print(json.dumps({"ready": True, "n_oracle": len(oracle)}), flush=True)
    times = {}
    for line in sys.stdin:
        name = line.strip()
        if not name or name == "EXIT":
            break
        sql = oracle.get(name)
        if sql is None:
            print(json.dumps({"q": name, "err": "no-oracle"}), flush=True)
            continue
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
            times[name] = min(times.get(name, float("inf")), dt)
            print(json.dumps({"q": name, "sec": round(dt, 6)}), flush=True)
        except Exception as e:
            print(json.dumps({"q": name, "err": str(e)[:200]}), flush=True)
    summary(times)


def main(sfdir, oracle_path):
    con, oracle = connect(sfdir, oracle_path)
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
    if "--serve" in sys.argv[3:]:
        serve(sys.argv[1], sys.argv[2])
    else:
        main(sys.argv[1], sys.argv[2])
