#!/usr/bin/env python3
"""Local pre-check of SparkEntry.queries vs oracleSql via DuckDB —
mirrors the driver's correctness gate (sorted-column value compare)."""
import duckdb, json, sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        mine = con.sql(f"select * from '{out}/{name}/*.parquet'").df()
        ora = con.sql(sql).df()
        cols = sorted(mine.columns)
        ocols = sorted(ora.columns)
        if cols != ocols:
            print(f"COLS-MISMATCH {name}: {cols} vs {ocols}")
            fails += 1
            continue
        a = mine[cols].sort_values(cols).reset_index(drop=True)
        b = ora[ocols].sort_values(ocols).reset_index(drop=True)
        if a.shape != b.shape:
            print(f"SHAPE-MISMATCH {name}: {a.shape} vs {b.shape}")
            fails += 1
            continue
        eq = (a.astype(str).values == b.astype(str).values)
        if eq.all():
            print(f"OK   {name} {a.shape}")
        else:
            import numpy as np
            bad = np.argwhere(~eq)[:5]
            print(f"VAL-MISMATCH {name}: {len(np.argwhere(~eq))} cells, e.g.")
            for r, c in bad:
                print(f"   row {r} col {cols[c]}: mine={a.iloc[r, c]!r} oracle={b.iloc[r, c]!r}")
            fails += 1
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1

# rows-only entries (no oracle)
import glob, os
for d in sorted(glob.glob(f"{out}/q*")):
    name = os.path.basename(d)
    if name not in oracle:
        n = con.sql(f"select count(*) from '{d}/*.parquet'").fetchone()[0]
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")

sys.exit(1 if fails else 0)
