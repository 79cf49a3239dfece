#!/usr/bin/env python3
"""Local replica of the driver's correctness check: run graft.Verify first
(dumps each query's result parquet + oracle_sql.json), then this script
executes each oracle SQL in DuckDB over the SF-dir tables and compares
rows/schema/values against the Spark dump.

Usage: oracle_check.py <sfDir> <verifyOutDir> [queryPrefix ...]
"""
import duckdb, glob, json, os, sys

sf, out = sys.argv[1], sys.argv[2]
prefixes = sys.argv[3:]

con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(rows):
    def nv(v):
        if isinstance(v, float):
            return round(v, 9)
        if isinstance(v, list):
            return tuple(nv(x) for x in v)
        return v
    return sorted(tuple(nv(v) for v in r) for r in rows)

bad = 0
for name in sorted(oracle):
    if prefixes and not any(name.startswith(p) for p in prefixes):
        continue
    sql = oracle[name]
    dump = f"{out}/{name}"
    try:
        spark_rel = con.sql(f"SELECT * FROM '{dump}/*.parquet'")
        spark_cols = [c.lower() for c in spark_rel.columns]
        spark_rows = norm(spark_rel.fetchall())
        o_rel = con.sql(sql)
        o_cols = [c.lower() for c in o_rel.columns]
        o_rows = norm(o_rel.fetchall())
        ok_rows = len(spark_rows) == len(o_rows)
        ok_schema = spark_cols == o_cols
        ok_hash = spark_rows == o_rows
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        if status != "OK":
            bad += 1
            print(f"{name}: {status} rows={len(spark_rows)}/{len(o_rows)} "
                  f"schema={ok_schema} hash={ok_hash}")
            if not ok_schema:
                print("  spark:", spark_cols, "\n  oracle:", o_cols)
            if ok_rows and not ok_hash:
                diffs = [(a, b) for a, b in zip(spark_rows, o_rows) if a != b]
                for a, b in diffs[:3]:
                    print("  spark:", a, "\n  oracle:", b)
        else:
            print(f"{name}: OK ({len(spark_rows)} rows)")
    except Exception as e:
        bad += 1
        print(f"{name}: ERROR {e}")
print(f"\n{'ALL OK' if bad == 0 else str(bad) + ' FAILURES'}")
sys.exit(1 if bad else 0)
