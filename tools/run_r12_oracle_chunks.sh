#!/bin/bash
# Finish the sf10 naive oracle sweep in memory-bounded chunks (the single
# monolithic check_oracle process was OOM-killed at 130 GB mid-q148:
# DuckDB working set + every previous big pandas compare accumulated in
# one process). One fresh process per chunk; q146/q148 excluded (already
# green via the collapsed oracle). Idempotent: a chunk skips if its log
# already says "oracle queries match".
set -u
cd /root/repo
i=0
while read -r CHUNK; do
  i=$((i+1))
  LOG=/tmp/campaign12/oracle_sf10_chunk$i.log
  if [ -s "$LOG" ] && grep -q "oracle queries match" "$LOG" && ! grep -q "FAIL" "$LOG"; then
    echo "chunk $i SKIPPED"; continue
  fi
  timeout 5400 python3 tools/check_oracle.py /tmp/graft_sf10 /tmp/verify_r12_sf10 "$CHUNK" > "$LOG" 2>&1
  echo "chunk $i exit=$? ok=$(grep -cE '^  OK' "$LOG") fail=$(grep -cE '^  FAIL' "$LOG") ($(date +%H:%M:%S))"
done < /tmp/campaign12/oracle_chunks.txt
echo ORACLE_CHUNKS_DONE
