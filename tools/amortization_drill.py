#!/usr/bin/env python3
"""Amortization drill orchestrator (VERDICT r15 #3): measures how the
per-query Spark/DuckDB ratio of the bench's overhead laggards falls as
data grows — the "Spark's fixed job floor amortizes at scale" claim as a
measurement instead of an argument.

Steps: build x10/x100 scaled copies of sf0.1 (tools/make_scaled_sf.py),
read the Spark medians produced by `runMain graft.tools.Amortize` (run it
FIRST — this script does not start sbt), time the same queries' DuckDB
oracles per dir (median of 3, same machine window), print the markdown
ratio table for SCALE.md.

Usage:
  python3 tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/graft_sfx10 10
  python3 tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/graft_sfx100 100
  sbt -batch "runMain graft.tools.Amortize <queries> <dirs>" | tee /tmp/amortize_spark.jsonl
  python3 tools/amortization_drill.py /tmp/amortize_spark.jsonl <oracle_sql.json>
"""
import json, statistics, sys, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_time(sfdir, sql, reps=3):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    times = []
    for _ in range(reps + 1):  # first run warms the page cache
        t0 = time.time()
        con.execute(sql).fetchall()
        times.append(time.time() - t0)
    con.close()
    return statistics.median(times[1:])


def main(spark_jsonl, oracle_path):
    oracle = json.load(open(oracle_path))
    spark = {}
    for line in open(spark_jsonl):
        line = line.strip()
        if not line.startswith('{"dir"'):
            continue
        r = json.loads(line)
        spark[(r["dir"], r["q"])] = r["spark_sec"]
    dirs = sorted({d for d, _ in spark}, key=lambda d: (len(d), d))
    qs = sorted({q for _, q in spark})
    rows = []
    for q in qs:
        sql = oracle.get(q)
        if sql is None:
            print(f"skip {q}: no oracle", file=sys.stderr)
            continue
        cells = []
        for d in dirs:
            s = spark.get((d, q))
            du = duck_time(d, sql)
            cells.append((s, du, s / du if du > 0 else float("inf")))
        rows.append((q, cells))
    hdr = "| query | " + " | ".join(
        f"{d.split('/')[-1]} spark / duck / ratio" for d in dirs) + " |"
    print(hdr)
    print("|---" * (len(dirs) + 1) + "|")
    for q, cells in rows:
        print(f"| {q} | " + " | ".join(
            f"{s:.2f}s / {du:.2f}s / **{r:.2f}x**" for s, du, r in cells) + " |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
