#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`. Compares each query's
parquet dump against its DuckDB oracle (row count, schema names,
value comparison with columns sorted by name).

The value comparison is DRIVER-EXACT: every cell is rendered with
Python `repr` of its native value and compared byte-for-byte — no
float tolerance, no int/float coercion, signed-zero-distinct
(`repr(-0.0) == '-0.0' != '0.0'`), and stored float NaN is rendered
'nan', DISTINCT from NULL's '∅' (pandas' parquet path conflates NULL
doubles with NaN, so both sides read through Arrow and NULL-ness comes
from the Arrow validity mask, not the pandas value). Round 7 shipped 6
red rows because the previous version compared floats at 1e-12
tolerance and silently coerced int-vs-float column pairs; this version
would have flagged all six locally."""
import sys, os, json, glob
import duckdb
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def canon(v, isnull):
    """Driver-exact cell rendering: NULL (per the Arrow validity mask)
    is '∅', stored float NaN is 'nan' (distinct — a Spark NaN vs oracle
    NULL must NOT pass), -0.0 kept distinct from 0.0, int kept distinct
    from float."""
    if isnull or v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return repr(v)
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return repr(v)


def col_reprs(series, mask):
    return [canon(v, mask[i]) for i, v in enumerate(series.tolist())]


fails = []
# iterate the CLAIMED set (oracle keys + any dumped dirs), not just the
# dirs present: a query that crashed inside Verify writes no directory,
# and an os.listdir-only sweep would print "0 failures" for it (the
# round-8 tfidf rewrite crash surfaced exactly this blind spot)
dumped = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
claimed = sorted(set(oracle) | dumped)
for name in claimed:
    path = os.path.join(outdir, name)
    if only and name not in only:
        continue
    if not os.path.isdir(path):
        print(f"FAIL {name}: no dump directory (query errored in Verify)")
        fails.append(name)
        continue
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet written"); fails.append(name); continue
    got_tbl = pq.read_table(files[0])
    got = got_tbl.to_pandas()
    # mirror the decimal→float64 rule on the SPARK side too (r9 ADVICE:
    # oracle-only mirroring would false-FAIL a DECIMAL-typed Spark dump
    # against the oracle's float repr; latent today because catalog
    # queries cast emitted decimals to double, but the gate should not
    # depend on that convention holding)
    import pyarrow.types as pt
    for f in got_tbl.schema:
        if pt.is_decimal(f.type):
            got[f.name] = got[f.name].astype("float64")
    if name not in oracle:
        status = "rows-only"
        ok = len(got) > 0
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {len(got)} rows ({status})")
        if not ok: fails.append(name)
        continue
    try:
        exp_tbl = con.sql(oracle[name]).arrow()
        exp = exp_tbl.to_pandas()
        # duckdb's .df() (the driver's path) renders DECIMAL as float64;
        # arrow keeps Decimal objects — mirror .df() so decimal-typed
        # oracle literals/emits compare the way the driver compares them
        import pyarrow.types as pt
        for f in exp_tbl.schema:
            if pt.is_decimal(f.type):
                exp[f.name] = exp[f.name].astype("float64")
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails.append(name); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} vs {ec}"); fails.append(name); continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails.append(name); continue
    g, e = got[gc].reset_index(drop=True), exp[gc].reset_index(drop=True)
    diff_cols = []
    examples = []
    for c in gc:
        gmask = pc.is_null(got_tbl[c]).to_pylist()
        emask = pc.is_null(exp_tbl[c]).to_pylist()
        gr, er = col_reprs(g[c], gmask), col_reprs(e[c], emask)
        bad = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b]
        if bad:
            diff_cols.append((c, len(bad)))
            for i in bad[:3]:
                examples.append(f"   row {i} col {c}: got={gr[i]} exp={er[i]}")
    if diff_cols:
        print(f"FAIL {name}: value diffs {diff_cols}")
        for line in examples[:6]:
            print(line)
        fails.append(name)
    else:
        print(f"ok   {name}: {len(got)} rows repr-equal")

print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
