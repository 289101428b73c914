#!/usr/bin/env python3
"""Merge per-SF Bench subset runs into BENCH_SCALE.json.

Usage: merge_scale.py <bench_sf0.001.json> <bench_sf0.01.json> <bench_sf0.1.json>

Each input is one graft.Bench output line (the per-query min-of-2
seconds for whatever subset was run). Existing BENCH_SCALE entries are
kept; queries present in all three inputs get their absolute seconds
refreshed and their x10 growth ratios recomputed.
"""
import sys, json

scale_path = "BENCH_SCALE.json"
scale = json.load(open(scale_path))
runs = [json.load(open(p)) for p in sys.argv[1:4]]
sfs = ["sf0.001", "sf0.01", "sf0.1"]
for sf, run in zip(sfs, runs):
    assert sf in run["sf"], f"{run['sf']} does not look like {sf}"

# growth ratios are only meaningful within ONE methodology: refuse to
# mix harness generations across the three inputs or against what the
# file already holds (the stamp exists precisely to prevent silent
# cross-methodology comparison — r9 ADVICE)
harnesses = {r.get("harness", "<unstamped>") for r in runs}
assert len(harnesses) == 1, f"inputs measured under different harnesses: {sorted(harnesses)}"
harness = harnesses.pop()
prev = scale.get("harness")
assert prev is None or prev == harness, (
    f"BENCH_SCALE.json holds {prev} entries; refusing to merge {harness} rows onto them "
    f"(delete/regenerate the file to switch methodologies)")
scale["harness"] = harness

common = set(runs[0]["queries"])
for r in runs[1:]:
    common &= {k for k, v in r["queries"].items() if v is not None}
for q in sorted(common):
    t = [r["queries"][q] for r in runs]
    if any(v is None for v in t):
        print(f"skip {q}: failed in one run")
        continue
    for sf, v in zip(sfs, t):
        scale["sfs"].setdefault(sf, {})[q] = v
    scale["growth_per_10x"][q] = {
        "x10_1": round(t[1] / t[0], 2),
        "x10_2": round(t[2] / t[1], 2),
    }
    print(f"{q}: {t[0]:.3f} -> {t[1]:.3f} -> {t[2]:.3f}  "
          f"(x{t[1]/t[0]:.2f}, x{t[2]/t[1]:.2f})")

scale["subset"] = sorted(scale["growth_per_10x"])
json.dump(scale, open(scale_path, "w"), indent=1, sort_keys=True)
print(f"wrote {scale_path}: {len(scale['subset'])} queries")
