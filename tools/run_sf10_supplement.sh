#!/bin/bash
# Round-7 sf10 supplement, run AFTER run_scale_campaign.sh: re-dump q109 in
# a fresh JVM (it OOMs at the tail of the shared 145-query dump JVM), dump
# the three round-7 queries the campaign's dump predates, oracle-check them
# (q147 naive; q146/q148 via the duplication-collapsed checker), and build
# the full-board CORRECTNESS_SF10 artifact.
set -u
cd /root/repo
mkdir -p /tmp/campaign

echo "=== supplement: fresh-JVM dumps ($(date +%H:%M:%S))"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=q109_gbt_train_score \
  timeout 3600 sbt -batch "runMain graft.Verify /tmp/graft_sf10 /tmp/verify_sf10" \
  > /tmp/campaign/sf10_q109.log 2>&1
echo "q109 exit=$?"; grep -c "\[verify\].*failed" /tmp/campaign/sf10_q109.log
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY=q146_incremental_neardup,q147_filter_funnel,q148_stream_neardup,q149_copurchase_pagerank \
  timeout 3600 sbt -batch "runMain graft.Verify /tmp/graft_sf10 /tmp/verify_sf10" \
  > /tmp/campaign/sf10_new.log 2>&1
echo "new exit=$?"; grep -c "\[verify\].*failed" /tmp/campaign/sf10_new.log

echo "=== supplement: oracles ($(date +%H:%M:%S))"
timeout 7200 python3 tools/check_oracle.py /tmp/graft_sf10 /tmp/verify_sf10 \
  "q147_filter_funnel,q149_copurchase_pagerank" \
  > /tmp/campaign/oracle_sf10_q147.log 2>&1
echo "q147/q149 exit=$?"; tail -3 /tmp/campaign/oracle_sf10_q147.log
timeout 7200 python3 tools/check_q146_collapsed.py /tmp/graft_sf10 /tmp/verify_sf10 \
  > /tmp/campaign/oracle_sf10_q146.log 2>&1
echo "q146/q148 exit=$?"; tail -3 /tmp/campaign/oracle_sf10_q146.log

echo "=== supplement: artifact ($(date +%H:%M:%S))"
SCALE_LABEL="sf10 (100x sf0.1, adversarial byte-identical replication)" \
  python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF10_r07.json \
  /tmp/verify_sf10 \
  /tmp/campaign/oracle_sf10_naive.log /tmp/campaign/oracle_sf10_pairs.log \
  /tmp/campaign/oracle_sf10_q69.log /tmp/campaign/oracle_sf10_q127.log \
  /tmp/campaign/oracle_sf10_q137.log /tmp/campaign/oracle_sf10_q147.log \
  /tmp/campaign/oracle_sf10_q146.log
echo "artifact exit=$?"
python3 - <<'EOF'
import json
d = json.load(open('/root/repo/CORRECTNESS_SF10_r07.json'))
print({k: v for k, v in d.items() if not isinstance(v, dict)})
EOF
echo "=== supplement done ($(date +%H:%M:%S))"
