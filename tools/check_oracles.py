#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracles.py <verifyOutDir> <sfDir>

For each query in <outDir>/oracle_sql.json: run the SQL in DuckDB over the
sfDir parquet tables, load the Spark parquet result, sort columns by name,
sort rows, and compare cell-by-cell (floats to 1e-9 rel tolerance).
"""
import json, sys, math
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    # Sort key: floats rounded to the compared precision so values that
    # differ only within tolerance cannot sort rows into different
    # positions on the Spark vs DuckDB side (ADVICE r01).
    def key_cell(x):
        if isinstance(x, float):
            return f"{x:.9g}"
        return str(x)
    return sorted(cols), sorted(out, key=lambda r: tuple(key_cell(x) for x in r))

def eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return a == b

fails = 0
for name, sql in sorted(oracles.items()):
    try:
        o = con.sql(sql)
        ocols, orows = o.columns, o.fetchall()
        s = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        scols, srows = s.columns, s.fetchall()
        oc, orr = canon(orows, ocols)
        sc, srr = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: schema {sc} vs oracle {oc}")
            fails += 1
            continue
        if len(orr) != len(srr):
            print(f"FAIL {name}: rows {len(srr)} vs oracle {len(orr)}")
            fails += 1
            continue
        bad = next((i for i, (x, y) in enumerate(zip(srr, orr))
                    if not all(eq(a, b) for a, b in zip(x, y))), None)
        if bad is not None:
            print(f"FAIL {name}: first mismatch row {bad}:\n  spark={srr[bad]}\n  duck ={orr[bad]}")
            fails += 1
        else:
            print(f"ok   {name}: {len(srr)} rows")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
