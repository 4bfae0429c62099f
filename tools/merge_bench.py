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
sides = [json.load(open(p)) for p in in_paths]

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
json.dump(merged, open(out_path, "w"))
print(f"merged {len(in_paths)} sidecars -> {out_path}: "
      f"{len(queries)} queries, total {total:.1f}s, failed {failed}")
