#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`. Compares each query's
parquet dump against its DuckDB oracle (row count, schema names,
value hash with columns sorted by name)."""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    if only and name not in only:
        continue
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet written"); fails.append(name); continue
    got = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        status = "rows-only"
        ok = len(got) > 0
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {len(got)} rows ({status})")
        if not ok: fails.append(name)
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails.append(name); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} vs {ec}"); fails.append(name); continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails.append(name); continue
    g, e = got[gc].reset_index(drop=True), exp[gc].reset_index(drop=True)
    diff_cols = []
    for c in gc:
        gv, ev = g[c], e[c]
        try:
            if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
                same = ((gv.astype(float) - ev.astype(float)).abs() < 1e-12) | (gv.isna() & ev.isna())
            else:
                same = (gv.astype(str) == ev.astype(str))
            if not same.all():
                diff_cols.append((c, int((~same).sum())))
        except Exception as ex:
            diff_cols.append((c, f"cmp-error {ex}"))
    if diff_cols:
        print(f"FAIL {name}: value diffs {diff_cols}")
        for c, _ in diff_cols[:2]:
            bad = (g[c].astype(str) != e[c].astype(str))
            idx = bad[bad].index[:3]
            for i in idx:
                print(f"   row {i} col {c}: got={g[c][i]!r} exp={e[c][i]!r}")
        fails.append(name)
    else:
        print(f"ok   {name}: {len(got)} rows hash-equal")

print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
