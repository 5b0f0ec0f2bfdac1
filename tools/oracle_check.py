#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfdir> <verify_outdir>
Loads each <outdir>/<query>/ parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over the testdata tables, sorts columns by
name and rows by value, and compares cell-by-cell.
"""
import json, math, sys
import duckdb
import pyarrow.dataset as ds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        return v  # exact compare; caller reports near-misses
    return v

def load_spark(path):
    t = ds.dataset(path).to_table()
    cols = sorted(t.column_names)
    rows = [tuple(norm_cell(r[c]) for c in cols) for r in t.to_pylist()]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            order = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dcols_sorted = [dcols[i] for i in order]
            drows = [tuple(norm_cell(r[i]) for i in order) for r in drows]
            drows = sorted(drows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
            scols, srows = load_spark(f"{outdir}/{name}")
            if scols != dcols_sorted:
                print(f"FAIL {name}: columns spark={scols} duck={dcols_sorted}")
                n_fail += 1; continue
            if len(srows) != len(drows):
                print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
                n_fail += 1; continue
            bad = None
            for i, (a, b) in enumerate(zip(srows, drows)):
                if a != b:
                    close = all(
                        (x == y) or (isinstance(x, float) and isinstance(y, float)
                                     and math.isfinite(x) and math.isfinite(y)
                                     and abs(x - y) <= 1e-9 * max(1, abs(x), abs(y)))
                        for x, y in zip(a, b))
                    bad = (i, a, b, close)
                    break
            if bad:
                i, a, b, close = bad
                tag = "NEAR" if close else "FAIL"
                print(f"{tag} {name}: row {i} spark={a} duck={b}")
                n_fail += 1
            else:
                print(f"ok   {name} ({len(srows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
