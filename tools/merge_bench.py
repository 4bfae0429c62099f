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

Probe attribution (round-11 advice): a per-query wall can win the merge
min from a JVM whose box-calibration probe differs from the fastest
probe across inputs — normalizing that wall by the min probe misstates
it (~2x observed for q149 in r11). The merge therefore records:
  - `box_calibrations`: EVERY input's probe, in input order;
  - `query_probes`:     for each query, the shuffle probe of the JVM
                        whose wall won the min — the ONLY probe that
                        wall may be normalized by;
  - `box_calibration`:  per-field min across inputs, kept for the
                        whole-run comparisons it was introduced for
                        (and for older tooling), NOT for per-query walls.

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
# should merge what exists while making the gap visible. ValueError
# covers truncated/corrupt JSON (a bench killed by `timeout` mid-write —
# which this campaign has actually hit) the same way as a missing file.
# Zero readable inputs is still a hard error — silently writing an empty
# merge would let scaling_report regenerate SCALING.md from nothing.
sides = []
for p in in_paths:
    try:
        sides.append(json.load(open(p)))
    except (OSError, ValueError) as e:
        print(f"merge_bench: SKIPPING missing/unreadable/corrupt sidecar {p}: {e}",
              file=sys.stderr)
if not sides:
    sys.exit(f"merge_bench: no readable sidecars among {in_paths}")

names = sorted({q for s in sides for q in s["queries"]}
               | {q for s in sides for q in s.get("failed", [])})
queries, runs, failed, query_probes = {}, {}, [], {}
for q in names:
    samples = [v for s in sides for v in s.get("runs", {}).get(q, [])]
    bests = [(s["queries"][q], i) for i, s in enumerate(sides) if q in s["queries"]]
    if not bests:
        failed.append(q)
        continue
    best, win = min(bests)
    queries[q] = best
    # Legacy inputs (no `runs` field) fall back to EVERY JVM's best wall,
    # not just the winner's — dropping the losers would silently degrade
    # the spread column to "-" for pre-r12 sidecars (round-12 advice).
    runs[q] = samples or [b for b, _ in bests]
    # The probe that wall may be normalized by: the winning JVM's own.
    # Nested sources: a merge-of-merges carries per-query probes already.
    src = sides[win]
    probe = src.get("query_probes", {}).get(
        q, src.get("box_calibration", {}).get("shuffle_sec", -1))
    if probe and probe > 0:
        query_probes[q] = probe

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
if query_probes:
    merged["query_probes"] = query_probes
# Every input's probe, in input order (round-11 advice) — so a reader can
# see the spread the min hides. <= 0 is the probe-failed sentinel.
cals = [s["box_calibration"] for s in sides if "box_calibration" in s]
if cals:
    merged["box_calibrations"] = cals
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
