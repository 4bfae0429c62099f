#!/bin/bash
# Round-10 scale supplement for q159 (degree assortativity) and q160
# (support-weighted PageRank, subgraph): the two queries added AFTER the
# main campaign phases. Gives them the same treatment q157/q158 got —
# oracle green at sf3 AND sf10, plus dedicated-JVM bench sidecars at both
# scales so they enter SCALING.md with a full curve (round-9 verdict asked
# exactly this of q153/q154; new queries should not repeat the gap).
# Run AFTER run_r10_finish.sh (shares /tmp/campaign10 and the corpora).
set -u
cd /root/repo
mkdir -p /tmp/campaign10

NEWQ="q159_assortativity,q160_weighted_pagerank_subgraph"

for sf in sf3 sf10; do
  echo "=== $sf verify dump ($(date +%H:%M:%S))"
  rm -rf /tmp/verify_newq2_$sf
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$NEWQ" timeout 7200 sbt -batch \
    "runMain graft.Verify /tmp/graft_$sf /tmp/verify_newq2_$sf" \
    > /tmp/campaign10/newq2_${sf}_dump.log 2>&1
  echo "dump exit=$?"
  timeout 7200 python3 tools/check_oracle.py /tmp/graft_$sf /tmp/verify_newq2_$sf "$NEWQ" \
    > /tmp/campaign10/newq2_${sf}_oracle.log 2>&1
  echo "oracle exit=$?"; tail -4 /tmp/campaign10/newq2_${sf}_oracle.log
done

SCALE_LABEL="sf3 (30x sf0.1) - q159/q160 scale supplement (added after the main round-10 phases)" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF3_r10_newq2.json /tmp/verify_newq2_sf3 \
  /tmp/campaign10/newq2_sf3_oracle.log
SCALE_LABEL="sf10 (100x sf0.1, adversarial byte-identical replication) - q159/q160 scale supplement" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF10_r10_newq2.json /tmp/verify_newq2_sf10 \
  /tmp/campaign10/newq2_sf10_oracle.log

bench () { # $1 sfdir  $2 out.json  $3 only-filter (or empty = full board)
  # NB: SPARK_GRAFT_ONLY must be OMITTED (not set empty) for a full-board
  # run — Bench treats an empty filter as "select nothing". First run of
  # this script hit that: b_sf1_b came back with zero queries and was
  # re-run by hand before the final merge.
  local envonly=()
  [ -n "$3" ] && envonly=(SPARK_GRAFT_ONLY="$3")
  env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$2" "${envonly[@]}" \
      timeout 10800 sbt -batch "runMain graft.Bench" \
      > "/tmp/campaign10/$(basename "$2" .json).log" 2>&1
  echo "bench $2 exit=$? ($(date +%H:%M:%S))"
}

echo "=== bench sidecars ($(date +%H:%M:%S))"
bench /tmp/graft_sf3  /tmp/campaign10/newq2_bench_sf3.json  "$NEWQ"
bench /tmp/graft_sf10 /tmp/campaign10/newq2_bench_sf10.json "$NEWQ"
# q153's merged r103 reads 4.5x off in-suite sf10 samples only (9.4 s) —
# one dedicated JVM bounds the suite-pressure share of that ratio.
bench /tmp/graft_sf10 /tmp/campaign10/d_q153_sf10.json "q153_copurchase_triangles"

# Second sf1 JVM + a dedicated q149 sf1 sample: b_sf1_a's late-suite walls
# (q149 73/100/150 s across its in-JVM samples vs r9's merged 24.8 s) look
# like accumulated-JVM pressure, but one JVM can't prove it — min-merge
# across a fresh JVM and a dedicated run settles suite-position vs real.
echo "=== sf1 second JVM + dedicated q149 ($(date +%H:%M:%S))"
bench /tmp/graft_sf1 /tmp/campaign10/b_sf1_b.json ""
bench /tmp/graft_sf1 /tmp/campaign10/d_q149_sf1.json "q149_copurchase_pagerank"

echo "=== re-merge + SCALING regen with the supplements ($(date +%H:%M:%S))"
python3 tools/merge_bench.py /tmp/campaign10/m_sf1.json /tmp/campaign10/b_sf1_a.json \
  /tmp/campaign10/b_sf1_b.json /tmp/campaign10/d_q149_sf1.json
python3 tools/merge_bench.py /tmp/campaign10/m_sf3.json  /tmp/campaign10/b_sf3_a.json \
  /tmp/campaign10/newq2_bench_sf3.json
python3 tools/merge_bench.py /tmp/campaign10/m_sf10.json \
  BENCH_SIDECAR_r10_sf10a.json BENCH_SIDECAR_r10_sf10b.json \
  BENCH_SIDECAR_r10_q109_sf10.json \
  /tmp/campaign10/d_q149_sf10.json /tmp/campaign10/d_ann_sf10.json \
  /tmp/campaign10/d_q153_sf10.json /tmp/campaign10/newq2_bench_sf10.json
python3 tools/scaling_report.py /tmp/campaign10/m_sf01.json /tmp/campaign10/m_sf1.json \
  /root/repo/SCALING.md /tmp/campaign10/m_sf3.json /tmp/campaign10/m_sf10.json
echo "=== newq2 supplement done ($(date +%H:%M:%S))"
