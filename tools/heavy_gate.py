#!/usr/bin/env python3
"""Isolated-heavy-rows gate: re-measure the most expensive in-catalog
rows in a fresh JVM and fail loudly when the full-catalog bench charged
any of them >2x its isolated cost.

This converts the r8/r9 judge adjudication (in-catalog heavy-row passes
were intermittently 5-9x their fresh-JVM cost) into a standing builder-
side regression guard: run it at round close against the round's
BENCH_LOCAL.json.

Usage: heavy_gate.py [bench_json=BENCH_LOCAL.json] [top_n=5]

Every top-N row re-runs via `sbt -batch 'runMain graft.Bench <csv>'`
(a fresh forked JVM, subset mode) — including rows the v4-chunked
harness already timed in a fresh chunk JVM: a chunk still carries up
to 2x chunkSize executions of history, and chunk-internal inflation is
exactly what this gate guards. Exit 1 when any checked row's
in-catalog min exceeds 2x its isolated min.
"""
import sys, json, os, subprocess, tempfile

bench_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
bench = json.load(open(bench_path))
sf_dir = bench["sf"]

timed = {q: t for q, t in bench["queries"].items() if t is not None}
top = sorted(timed, key=lambda q: -timed[q])[:top_n]
to_check = list(top)
for q in top:
    print(f"top row {q}: {timed[q]:.2f}s in catalog (re-measuring)")

out = tempfile.mktemp(prefix="heavy_gate_", suffix=".json")
env = dict(os.environ, SPARK_GRAFT_BENCH_OUT=out, SPARK_GRAFT_SF_DIR=sf_dir)
cmd = ["sbt", "-batch", f"runMain graft.Bench {','.join(sorted(to_check))}"]
print(f"+ {' '.join(cmd)}  (SPARK_GRAFT_SF_DIR={sf_dir})")
r = subprocess.run(cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
if r.returncode != 0 or not os.path.exists(out):
    print(f"GATE ERROR: isolated re-run failed (rc={r.returncode})")
    sys.exit(2)

iso = json.load(open(out))
bad = []
for q in sorted(to_check):
    it = iso["queries"].get(q)
    if it is None:
        print(f"GATE ERROR: {q} failed in the isolated run")
        bad.append(q)
        continue
    ratio = timed[q] / it
    verdict = "FAIL" if ratio > 2.0 else "ok"
    print(f"{verdict:4s} {q}: in-catalog {timed[q]:.2f}s vs isolated {it:.2f}s ({ratio:.2f}x)")
    if ratio > 2.0:
        bad.append(q)

if bad:
    print(f"\nGATE FAIL: {bad} — the full-catalog bench is inflating these rows; "
          "isolate them (SPARK_GRAFT_HEAVY) or find the in-JVM cause")
    sys.exit(1)
print("\ngate PASS: every checked row's in-catalog cost is within 2x of isolated")
