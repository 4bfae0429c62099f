#!/bin/bash
# Round-13 inherited-state green gate: full board at sf0.01 and sf0.1.
# Board: 169 queries (q167_pq_delete / q168_ivf_imbalance /
# q169_external_compact NEW from the interrupted post-r12 session —
# rows-only by design, spec-backed in SimilaritySpec). Idempotent resume.
set -u
cd /root/repo
mkdir -p /tmp/campaign13
SKIP_NAIVE="q127_cluster_canonical q137_pareto_parts q28_ngram_jaccard q35_embedding_neardup q69_embedding_clusters"

for pair in "/root/testdata/sf0.01 sf001" "/root/testdata/sf0.1 sf01"; do
  set -- $pair; SFDIR=$1; TAG=$2
  if [ -s "/tmp/verify_r13_$TAG/oracle_sql.json" ]; then
    echo "=== verify $TAG dump SKIPPED (exists)"
  else
    echo "=== verify $TAG dump ($(date +%H:%M:%S))"
    rm -rf /tmp/verify_r13_$TAG
    SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 timeout 7200 sbt -batch \
      "runMain graft.Verify $SFDIR /tmp/verify_r13_$TAG" \
      > /tmp/campaign13/${TAG}_dump.log 2>&1
    echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign13/${TAG}_dump.log)"
  fi
  if [ -s "/tmp/campaign13/oracle_${TAG}_naive.log" ] && grep -q "oracle queries match" /tmp/campaign13/oracle_${TAG}_naive.log; then
    echo "=== oracle $TAG SKIPPED (exists)"
  else
    ONLY=$(python3 - <<PYEOF
import json
names = sorted(json.load(open('/tmp/verify_r13_$TAG/oracle_sql.json')))
skip = set("$SKIP_NAIVE".split())
print(",".join(n for n in names if n not in skip))
PYEOF
)
    timeout 7200 python3 tools/check_oracle.py $SFDIR /tmp/verify_r13_$TAG "$ONLY" \
      > /tmp/campaign13/oracle_${TAG}_naive.log 2>&1
    echo "naive exit=$?"; tail -2 /tmp/campaign13/oracle_${TAG}_naive.log
    for t in pairs q69 q127 q137; do
      timeout 3600 python3 tools/check_${t}_collapsed.py $SFDIR /tmp/verify_r13_$TAG \
        > /tmp/campaign13/oracle_${TAG}_${t}.log 2>&1
      echo "$t exit=$?: $(tail -1 /tmp/campaign13/oracle_${TAG}_${t}.log)"
    done
  fi
done
echo "=== r13 green-gate verify done ($(date +%H:%M:%S))"
