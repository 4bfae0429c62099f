#!/bin/bash
# Round-11 verify phase: full board at sf0.01 (gate parity) and sf0.1.
# Board this round: 162 queries (q162_ivf_admit NEW — no-oracle family,
# rows-only). Touched surface vs r10: the five PageRank variants now load
# PERSISTED symmetrized stacks (q149/q151/q155/q160/q161), q159 gained a
# loud overflow guard, q162 is new; everything else unchanged.
set -u
cd /root/repo
mkdir -p /tmp/campaign11
SKIP_NAIVE="q127_cluster_canonical q137_pareto_parts q28_ngram_jaccard q35_embedding_neardup q69_embedding_clusters"

for pair in "/root/testdata/sf0.01 sf001" "/root/testdata/sf0.1 sf01"; do
  set -- $pair; SFDIR=$1; TAG=$2
  echo "=== verify $TAG dump ($(date +%H:%M:%S))"
  rm -rf /tmp/verify_r11_$TAG
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 timeout 7200 sbt -batch \
    "runMain graft.Verify $SFDIR /tmp/verify_r11_$TAG" \
    > /tmp/campaign11/${TAG}_dump.log 2>&1
  echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign11/${TAG}_dump.log)"
  ONLY=$(python3 - <<PYEOF
import json
names = sorted(json.load(open('/tmp/verify_r11_$TAG/oracle_sql.json')))
skip = set("$SKIP_NAIVE".split())
print(",".join(n for n in names if n not in skip))
PYEOF
)
  timeout 7200 python3 tools/check_oracle.py $SFDIR /tmp/verify_r11_$TAG "$ONLY" \
    > /tmp/campaign11/oracle_${TAG}_naive.log 2>&1
  echo "naive exit=$?"; tail -2 /tmp/campaign11/oracle_${TAG}_naive.log
  for t in pairs q69 q127 q137; do
    timeout 3600 python3 tools/check_${t}_collapsed.py $SFDIR /tmp/verify_r11_$TAG \
      > /tmp/campaign11/oracle_${TAG}_${t}.log 2>&1
    echo "$t exit=$?: $(tail -1 /tmp/campaign11/oracle_${TAG}_${t}.log)"
  done
done
echo "=== r11 verify phase done ($(date +%H:%M:%S))"
