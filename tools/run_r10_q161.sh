#!/bin/bash
# q161 (personalized PageRank, subgraph) scale treatment: oracle at
# sf0.1/sf3/sf10 plus dedicated bench sidecars at all four scales, merged
# into the round-10 artifacts so the query enters with a full curve.
# Run after run_r10_newq2.sh (shares /tmp/campaign10 and the corpora).
set -u
cd /root/repo
mkdir -p /tmp/campaign10

Q="q161_ppr_subgraph"

for sf in sf01 sf3 sf10; do
  case $sf in
    sf01) dir=/root/testdata/sf0.1 ;;
    *)    dir=/tmp/graft_$sf ;;
  esac
  echo "=== $sf verify ($(date +%H:%M:%S))"
  rm -rf /tmp/verify_q161_$sf
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$Q" timeout 7200 sbt -batch \
    "runMain graft.Verify $dir /tmp/verify_q161_$sf" \
    > /tmp/campaign10/q161_${sf}_dump.log 2>&1
  echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign10/q161_${sf}_dump.log)"
  timeout 7200 python3 tools/check_oracle.py $dir /tmp/verify_q161_$sf "$Q" \
    > /tmp/campaign10/q161_${sf}_oracle.log 2>&1
  echo "oracle exit=$?"; tail -3 /tmp/campaign10/q161_${sf}_oracle.log
done

SCALE_LABEL="sf3 (30x sf0.1) - q161 scale supplement" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF3_r10_q161.json /tmp/verify_q161_sf3 \
  /tmp/campaign10/q161_sf3_oracle.log
SCALE_LABEL="sf10 (100x sf0.1, adversarial byte-identical replication) - q161 scale supplement" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF10_r10_q161.json /tmp/verify_q161_sf10 \
  /tmp/campaign10/q161_sf10_oracle.log

bench () { # $1 sfdir  $2 out.json  $3 only-filter (non-empty here)
  env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$2" SPARK_GRAFT_ONLY="$3" \
      timeout 10800 sbt -batch "runMain graft.Bench" \
      > "/tmp/campaign10/$(basename "$2" .json).log" 2>&1
  echo "bench $2 exit=$? ($(date +%H:%M:%S))"
}

echo "=== bench sidecars ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign10/q161_bench_sf01.json "$Q"
bench /tmp/graft_sf1      /tmp/campaign10/q161_bench_sf1.json  "$Q"
bench /tmp/graft_sf3      /tmp/campaign10/q161_bench_sf3.json  "$Q"
bench /tmp/graft_sf10     /tmp/campaign10/q161_bench_sf10.json "$Q"

echo "=== re-merge + SCALING regen ($(date +%H:%M:%S))"
python3 tools/merge_bench.py /tmp/campaign10/m_sf01.json /tmp/campaign10/b_sf01_a.json \
  /tmp/campaign10/b_sf01_b.json /tmp/campaign10/q161_bench_sf01.json
python3 tools/merge_bench.py /tmp/campaign10/m_sf1.json /tmp/campaign10/b_sf1_a.json \
  /tmp/campaign10/b_sf1_b.json /tmp/campaign10/d_q149_sf1.json /tmp/campaign10/q161_bench_sf1.json
python3 tools/merge_bench.py /tmp/campaign10/m_sf3.json /tmp/campaign10/b_sf3_a.json \
  /tmp/campaign10/newq2_bench_sf3.json /tmp/campaign10/d_q149_sf3.json \
  /tmp/campaign10/q161_bench_sf3.json
python3 tools/merge_bench.py /tmp/campaign10/m_sf10.json \
  BENCH_SIDECAR_r10_sf10a.json BENCH_SIDECAR_r10_sf10b.json \
  BENCH_SIDECAR_r10_q109_sf10.json \
  /tmp/campaign10/d_q149_sf10.json /tmp/campaign10/d_ann_sf10.json \
  /tmp/campaign10/d_q153_sf10.json /tmp/campaign10/newq2_bench_sf10.json \
  /tmp/campaign10/q161_bench_sf10.json
python3 tools/scaling_report.py /tmp/campaign10/m_sf01.json /tmp/campaign10/m_sf1.json \
  /root/repo/SCALING.md /tmp/campaign10/m_sf3.json /tmp/campaign10/m_sf10.json
echo "=== q161 supplement done ($(date +%H:%M:%S))"
