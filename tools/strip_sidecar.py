#!/usr/bin/env python3
"""Copy a Bench sidecar with named queries REMOVED.

Usage: strip_sidecar.py <in.json> <out.json> <q1,q2,...>

Campaign use (round 13): same-box leftover sidecars from earlier rounds
are merged in as extra JVM samples for queries whose code is unchanged —
but the queries the current round touched must be stripped from those
inputs first, so a stale-code wall can never win the min-across-JVMs
merge. Only the fields merge_bench.py reads (queries/runs/tainted/failed/
query_probes) are filtered; the sidecar-level totals are left as-is and
ignored by the merge.
"""
import json
import sys

src, dst, names = sys.argv[1], sys.argv[2], set(sys.argv[3].split(","))
d = json.load(open(src))
for field in ("queries", "runs", "tainted", "query_probes"):
    if field in d and isinstance(d[field], dict):
        d[field] = {k: v for k, v in d[field].items() if k not in names}
if isinstance(d.get("failed"), list):
    d["failed"] = [q for q in d["failed"] if q not in names]
d["stripped"] = sorted(names)
json.dump(d, open(dst, "w"))
print(f"strip_sidecar: {src} -> {dst} minus {len(names)} queries "
      f"({len(d['queries'])} remain)")
