#!/bin/bash
# Round-13 sf10 full-board oracle sweep — chunked (the r12 OOM lesson: one
# fresh DuckDB process per chunk), LIGHT CHUNKS FIRST two at a time, then
# the collapsed checkers sequentially (each is RAM-heavy at sf10), then
# q147 (the ~30-min 100 GB monster) alone at the very end. After EVERY
# step the artifact is rebuilt from all logs present, so a cut-off
# session still leaves a consistent CORRECTNESS_SF10_r13.json whose
# unchecked_oracle_queries lists exactly what did not run.
set -u
cd /root/repo
mkdir -p /tmp/campaign13
DUMP=/tmp/verify_r13_sf10
SF=/tmp/graft_sf10

SKIP_NAIVE="q127_cluster_canonical q137_pareto_parts q28_ngram_jaccard q35_embedding_neardup q69_embedding_clusters"
INFEASIBLE_SF10="q149_copurchase_pagerank q150_copurchase_components"

if [ ! -s "$DUMP/oracle_sql.json" ]; then
  echo "r13 oracle: no dump at $DUMP — run the campaign's phase D first"; exit 1
fi

python3 - <<PYEOF
import json
names = sorted(json.load(open("$DUMP/oracle_sql.json")))
skip = set("$SKIP_NAIVE".split()) | set("$INFEASIBLE_SF10".split()) \
    | {"q146_incremental_neardup", "q148_stream_neardup", "q147_filter_funnel"}
light = [n for n in names if n not in skip]
chunks = [light[i:i+12] for i in range(0, len(light), 12)]
with open("/tmp/campaign13/oracle_chunks.txt", "w") as f:
    for c in chunks:
        f.write(",".join(c) + "\n")
print(f"{len(light)} light queries in {len(chunks)} chunks")
PYEOF

rebuild () {
  SCALE_LABEL="sf10 (100x sf0.1, adversarial byte-identical replication) - FULL BOARD round 13 (ask #6: fresh per round; r13 code, 169 queries incl. the new q167/q168/q169 rows-only lifecycle entries). Excluded by documented DuckDB infeasibility, NOT engine failure: q149/q150 full-graph oracles (DuckDB exhausts RAM above sf3; the subgraph twins q151/q152/q155 oracle the same operator code at sf10). unchecked_oracle_queries = sweep chunks that had not completed when this artifact was built (rebuilt after every chunk)." \
  python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF10_r13.json "$DUMP" \
    $(ls /tmp/campaign13/oracle_sf10_*.log 2>/dev/null)
}

runchunk () { # $1 chunk-id  $2 queries
  local LOG=/tmp/campaign13/oracle_sf10_chunk$1.log
  if [ -s "$LOG" ] && grep -qE '^  (OK|FAIL)' "$LOG" && ! grep -q Traceback "$LOG"; then
    echo "chunk $1 SKIPPED"; return
  fi
  timeout 5400 python3 tools/check_oracle.py "$SF" "$DUMP" "$2" > "$LOG" 2>&1
  echo "chunk $1 exit=$? ok=$(grep -cE '^  OK' "$LOG") fail=$(grep -cE '^  FAIL' "$LOG") ($(date +%H:%M:%S))"
}

i=0
PIDS=()
while read -r CHUNK; do
  i=$((i+1))
  runchunk "$i" "$CHUNK" &
  PIDS+=($!)
  if [ ${#PIDS[@]} -ge 2 ]; then
    wait "${PIDS[0]}"; PIDS=("${PIDS[@]:1}")
    rebuild
  fi
done < /tmp/campaign13/oracle_chunks.txt
wait
rebuild

collapsed () { # $1 tag  $2 script-args...
  local t=$1; shift
  local LOG=/tmp/campaign13/oracle_sf10_$t.log
  if [ -s "$LOG" ] && grep -qE '^  (OK|FAIL)' "$LOG"; then echo "$t SKIPPED"; return; fi
  timeout 7200 python3 "$@" > "$LOG" 2>&1
  echo "$t exit=$?: $(tail -1 "$LOG")"
  rebuild
}
collapsed pairs tools/check_pairs_collapsed.py "$SF" "$DUMP"
collapsed q69   tools/check_q69_collapsed.py   "$SF" "$DUMP"
collapsed q127  tools/check_q127_collapsed.py  "$SF" "$DUMP"
collapsed q137  tools/check_q137_collapsed.py  "$SF" "$DUMP"
collapsed q146  tools/check_q146_collapsed.py  "$SF" "$DUMP"

runchunk q147 "q147_filter_funnel"
rebuild
echo "ORACLE_SWEEP_DONE ($(date +%H:%M:%S))"
