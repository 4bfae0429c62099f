#!/usr/bin/env python3
"""Merge the sf3 oracle-sweep logs into one CORRECTNESS-style artifact.

Inputs: check_oracle logs (any number) with '  OK   <name>  (N rows x C cols)'
lines, plus the collapsed-oracle check outputs for q127/q137 (same line
shape, tagged '(collapsed oracle)'). Output JSON maps each query ->
{match, rows, oracle} where oracle is 'naive' | 'collapsed' | 'none'
(no-oracle queries are listed from SparkEntry's dump dir without a check).

Usage: build_sf3_artifact.py <out.json> <verifyOutDir> <log> [log...]
Set SCALE_LABEL to override the artifact's "sf" description (defaults to
the sf3 wording for backward compatibility).
"""
import json
import os
import re
import sys

OUT, VERIFY_DIR = sys.argv[1], sys.argv[2]
LOGS = sys.argv[3:]

LINE = re.compile(r"^  (OK|FAIL)\s+(\S+)(?:\s+\((collapsed oracle)\))?"
                  r"(?:\s+\((\d+) rows x (\d+) cols\))?")

result = {}
for log in LOGS:
    for line in open(log):
        m = LINE.match(line)
        if not m:
            continue
        status, name, collapsed, rows, cols = m.groups()
        result[name] = {
            "match": status == "OK",
            "rows": int(rows) if rows else None,
            "oracle": "collapsed" if collapsed else "naive",
        }

oracle_names = set(json.load(open(f"{VERIFY_DIR}/oracle_sql.json")))
dumped = {d for d in os.listdir(VERIFY_DIR)
          if os.path.isdir(os.path.join(VERIFY_DIR, d))}
for name in sorted(dumped - oracle_names):
    result[name] = {"match": None, "rows": None, "oracle": "none"}

missing = sorted(oracle_names - set(result))
summary = {
    "sf": os.environ.get(
        "SCALE_LABEL", "sf3 (30x sf0.1, adversarial byte-identical replication)"),
    "n_queries_dumped": len(dumped),
    "n_oracle_checked": sum(1 for v in result.values() if v["oracle"] != "none"),
    "n_green": sum(1 for v in result.values() if v["match"]),
    "n_red": sum(1 for v in result.values() if v["match"] is False),
    "unchecked_oracle_queries": missing,
    "queries": dict(sorted(result.items())),
}
json.dump(summary, open(OUT, "w"), indent=1)
print(f"{summary['n_green']} green / {summary['n_red']} red / "
      f"{len(missing)} unchecked -> {OUT}")
