#!/usr/bin/env python3
"""Build a SCALED copy of a testdata dir for the amortization drill
(VERDICT r15 #3): events and lineitem replicate `factor`x with id-shifted
replicas (distributions preserved — counts scale exactly linearly, so the
per-query Spark-vs-DuckDB ratio curve measures engine overhead
amortization, not data pathology); every other table copies as-is.

Usage: python3 tools/make_scaled_sf.py <src_sfdir> <dst_dir> <factor>
"""
import os, shutil, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    shift = 10_000_000_000
    con.execute(f"""
      COPY (SELECT event_id + r.r * {shift} AS event_id, ts,
                   user_id + r.r * {shift} AS user_id,
                   event_type, value, props
            FROM '{src}/events.parquet', range({factor}) r(r))
      TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (SELECT l_orderkey + r.r * {shift} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM '{src}/lineitem.parquet', range({factor}) r(r))
      TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
    for t in TABLES:
        if t in ("events", "lineitem"):
            continue
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    n = con.execute(f"SELECT count(*) FROM '{dst}/events.parquet'").fetchone()[0]
    print(f"scaled {src} -> {dst} x{factor}: events={n}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
