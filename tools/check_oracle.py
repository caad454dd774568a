#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet against the DuckDB oracle in oracle_sql.json
on the same sf tables. Exact-match after sorting columns by name and rows
by all columns; floats compared exactly AND with tolerance so we can see
how close a miss is.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name in sorted(oracle):
    res_dir = os.path.join(out_dir, name)
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    try:
        got = con.sql(
            f"SELECT * FROM '{res_dir}/*.parquet'").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {str(e).splitlines()[0]}"); fails += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} vs {ec}"); fails += 1; continue
    got = got[gc].sort_values(gc).reset_index(drop=True)
    exp = exp[ec].sort_values(ec).reset_index(drop=True)
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    bad = []
    for c in gc:
        g, e = got[c], exp[c]
        if g.dtype.kind == 'f' or e.dtype.kind == 'f':
            eq = np.isclose(g.astype(float), e.astype(float),
                            rtol=0, atol=0, equal_nan=True)
            close = np.isclose(g.astype(float), e.astype(float),
                               rtol=1e-9, atol=1e-9, equal_nan=True)
            if not eq.all():
                tag = "exact-miss" if close.all() else "VALUE-DIFF"
                bad.append((c, tag, int((~eq).sum())))
        else:
            try:
                neq = (g != e) & ~(pd.isna(g) & pd.isna(e))
            except Exception:
                neq = pd.Series([str(a) != str(b) for a, b in zip(g, e)])
            if neq.any():
                bad.append((c, "VALUE-DIFF", int(neq.sum())))
    # dtype visibility (driver may compare schemas)
    dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in gc
          if str(got[c].dtype) != str(exp[c].dtype)]
    if bad:
        print(f"FAIL {name}: {bad} dtypes={dt}"); fails += 1
    else:
        extra = f" dtype-note={dt}" if dt else ""
        print(f"OK   {name}: {len(got)} rows{extra}")
print("---"); print("ALL GREEN" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
