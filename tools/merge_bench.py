#!/usr/bin/env python3
"""Merge N Bench sidecars (separate fresh-JVM invocations) into one.

Why: a single shared JVM accumulates heap/page-cache pressure across a
full-suite run, and round 6's sf10 sidecar showed 3-6x run-to-run swings
on unchanged code. Min-across-independent-JVMs is the estimator that
defeats both brief steal storms (which best-of-N inside one JVM already
handles) and whole-process degradation (which it cannot). The merged
sidecar keeps EVERY sample in `runs`, so the spread column in SCALING.md
is computed over all JVMs' samples and a reader can judge any wall
against its own variance.

Usage: merge_bench.py <out.json> <sidecar.json> [sidecar.json ...]
A query failed in the merge only if it failed in EVERY input (a pass in
any JVM proves the plan runs; `queries` then carries that JVM's best).
"""
import json
import sys

out_path, in_paths = sys.argv[1], sys.argv[2:]
# Missing inputs are skipped LOUDLY instead of crashing: campaign scripts
# list every sidecar a full run would produce, and a partial rerun (or a
# script that never wrote one of them — the round-10 d_q149_sf3 case)
# should merge what exists while making the gap visible. Zero readable
# inputs is still a hard error — silently writing an empty merge would
# let scaling_report regenerate SCALING.md from nothing.
sides = []
for p in in_paths:
    try:
        sides.append(json.load(open(p)))
    except OSError as e:
        print(f"merge_bench: SKIPPING missing/unreadable sidecar {p}: {e}",
              file=sys.stderr)
if not sides:
    sys.exit(f"merge_bench: no readable sidecars among {in_paths}")

names = sorted({q for s in sides for q in s["queries"]}
               | {q for s in sides for q in s.get("failed", [])})
queries, runs, failed = {}, {}, []
for q in names:
    samples = [v for s in sides for v in s.get("runs", {}).get(q, [])]
    bests = [s["queries"][q] for s in sides if q in s["queries"]]
    if not bests:
        failed.append(q)
        continue
    queries[q] = min(bests)
    runs[q] = samples or bests

ml = {"q109_gbt_train_score"}
total = sum(queries.values())
merged = {
    "metric": "total",
    "value": total,
    "unit": "sec",
    "engine_total": total - sum(v for k, v in queries.items() if k in ml),
    "ml_total": sum(v for k, v in queries.items() if k in ml),
    "queries": queries,
    "runs": runs,
    "failed": failed,
    "sf": sides[0].get("sf", "?"),
    "merged_from": len(sides),
}
# Box calibration (round-10 ask #1): per-field min across the input JVMs —
# the same best-of-N estimator the query walls use. Present only if at
# least one input carried it (older sidecars predate the probe).
cals = [s["box_calibration"] for s in sides if "box_calibration" in s]
if cals:
    # <= 0 is the probe-failed sentinel — never let it win the min.
    cal = {}
    for k in sorted({k for c in cals for k in c}):
        vals = [c[k] for c in cals if c.get(k, -1) > 0]
        if vals:
            cal[k] = min(vals)
    if cal:
        merged["box_calibration"] = cal
json.dump(merged, open(out_path, "w"))
print(f"merged {len(sides)}/{len(in_paths)} sidecars -> {out_path}: "
      f"{len(queries)} queries, total {total:.1f}s, failed {failed}")
