#!/bin/bash
# Round-13 campaign — the full probe-attributed four-scale matrix (round-12
# ask #1) plus the fresh sf10 full-board correctness artifact (ask #6) and
# the dedicated q109 probe-qualified sample (ask #7).
#
# Box context: THIS box is the same machine that ran the r11 and r12
# campaigns (/tmp survived), and their per-JVM sidecars carry their own
# box_calibration probes. The round-13 engine diff touches ONLY the ANN
# lifecycle family (q162..q169) — every other query is code-identical to
# the r12 sidecars (and, outside the r12 graph-pin family, to r11's sf10
# sidecars). The matrix therefore merges:
#   - fresh r13 JVMs for everything the round touched or added, plus the
#     all-fresh sf0.1 headline pair;
#   - same-box r11/r12 leftover JVMs (with the touched families STRIPPED
#     from those inputs, so a stale-code wall can never win a merge) for
#     the unchanged queries at sf1/sf3/sf10.
# Every merged sidecar carries per-query winning-JVM probes
# (query_probes), so SCALING.md normalizes each wall by the probe of the
# JVM that produced it.
#
# Phases (idempotent: each step skips if its output exists):
#   E   dedicated sf10 JVMs: q149+q155 (graph continuity), q109 (ask #7)
#   D   sf10 FULL-BOARD verify dump (169 queries, r13 code)
#   B   bench matrix: sf0.1 full x2 fresh; sf1/sf3 touched-only fresh;
#       sf10 touched+graph fresh
#   T   sf3 touched-family dump -> CORRECTNESS_SF3_r13_touched.json
#       (rows-only: the whole touched surface is the no-oracle ANN
#       lifecycle family, spec-backed)
#   C   strip + merge + SCALING.md regeneration
#   S3  sf10 chunked DuckDB oracle sweep, light chunks 2-way parallel,
#       collapsed checkers, q147 last; CORRECTNESS_SF10_r13.json is
#       REBUILT after every chunk so a cut-off session still leaves a
#       consistent artifact with honest unchecked_oracle_queries.
#   X   converged-PageRank extras (per-round tracking)
set -u
cd /root/repo
mkdir -p /tmp/campaign13

TOUCHED13="q162_ivf_admit,q163_ivf_compact,q164_stream_ivf_admit,q165_ivf_delete,q166_pq_admit,q167_pq_delete,q168_ivf_imbalance,q169_external_compact"
# Graph family re-shaped by the r12 src-partitioned pin: r11 sf10 walls are
# stale for these, so they run fresh at sf10 (q149/q155 via phase E).
GRAPH_SF10="q150_copurchase_components,q151_pagerank_subgraph,q152_components_subgraph,q153_copurchase_triangles,q154_link_prediction,q156_clustering_coefficient,q157_kcore,q159_assortativity,q160_weighted_pagerank_subgraph,q161_ppr_subgraph"
SKIP_NAIVE="q127_cluster_canonical q137_pareto_parts q28_ngram_jaccard q35_embedding_neardup q69_embedding_clusters"
INFEASIBLE_SF10="q149_copurchase_pagerank q150_copurchase_components"

bench () { # $1 sfdir  $2 out.json  $3 only-filter (or empty)
  if [ -s "$2" ]; then echo "bench $2 SKIPPED (exists)"; return; fi
  local envonly=()
  [ -n "$3" ] && envonly=(SPARK_GRAFT_ONLY="$3")
  env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$2" \
      "${envonly[@]}" timeout 10800 sbt -batch "runMain graft.Bench" \
      > "/tmp/campaign13/$(basename "$2" .json).log" 2>&1
  echo "bench $2 exit=$? ($(date +%H:%M:%S))"
}

echo "=== phase E: dedicated sf10 samples ($(date +%H:%M:%S))"
bench /tmp/graft_sf10 /tmp/campaign13/e_q149_q155_sf10.json "q149_copurchase_pagerank,q155_pagerank_converged_subgraph"
bench /tmp/graft_sf10 /tmp/campaign13/e_q109_sf10.json "q109_gbt_train_score"

if [ -s /tmp/verify_r13_sf10/oracle_sql.json ]; then
  echo "=== phase D SKIPPED (dump exists)"
else
  echo "=== phase D: sf10 full-board dump ($(date +%H:%M:%S))"
  rm -rf /tmp/verify_r13_sf10
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 timeout 14400 sbt -batch \
    "runMain graft.Verify /tmp/graft_sf10 /tmp/verify_r13_sf10" \
    > /tmp/campaign13/sf10_dump.log 2>&1
  echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign13/sf10_dump.log)"
fi

echo "=== phase B: bench matrix ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign13/b_sf01_a.json ""
bench /root/testdata/sf0.1 /tmp/campaign13/b_sf01_b.json ""
bench /tmp/graft_sf1  /tmp/campaign13/b_sf1_t.json  "$TOUCHED13"
bench /tmp/graft_sf3  /tmp/campaign13/b_sf3_t.json  "$TOUCHED13"
bench /tmp/graft_sf10 /tmp/campaign13/b_sf10_t.json "$TOUCHED13,$GRAPH_SF10"

if [ -s /root/repo/CORRECTNESS_SF3_r13_touched.json ]; then
  echo "=== phase T SKIPPED (artifact exists)"
else
  echo "=== phase T: sf3 touched dump ($(date +%H:%M:%S))"
  rm -rf /tmp/verify_r13_sf3
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$TOUCHED13" timeout 7200 sbt -batch \
    "runMain graft.Verify /tmp/graft_sf3 /tmp/verify_r13_sf3" \
    > /tmp/campaign13/sf3_dump.log 2>&1
  echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign13/sf3_dump.log)"
  SCALE_LABEL="sf3 (30x sf0.1) - round-13 touched queries: the ANN lifecycle family q162-q169, all rows-only by design (approximate/quantizer-derived families), each pinned by exact-equality SimilaritySpec invariants (settled==one-shot, probe-over-tombstones==physical-rebuild, compacted==masked, imbalance detects skew); full oracled board is CORRECTNESS_SF10_r13 / CORRECTNESS_SF3_r08" \
  python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF3_r13_touched.json /tmp/verify_r13_sf3
fi

echo "=== phase C: strip + merge + SCALING.md ($(date +%H:%M:%S))"
python3 tools/strip_sidecar.py /tmp/campaign12/b_sf01_a.json /tmp/campaign13/r12_sf01_a.json "$TOUCHED13"
python3 tools/strip_sidecar.py /tmp/campaign12/b_sf01_b.json /tmp/campaign13/r12_sf01_b.json "$TOUCHED13"
python3 tools/strip_sidecar.py /tmp/campaign12/b_sf1_a.json  /tmp/campaign13/r12_sf1_a.json  "$TOUCHED13"
python3 tools/strip_sidecar.py /tmp/campaign12/b_sf3_a.json  /tmp/campaign13/r12_sf3_a.json  "$TOUCHED13"
python3 tools/strip_sidecar.py /tmp/campaign11/b_sf10_a.json /tmp/campaign13/r11_sf10_a.json "$TOUCHED13,$GRAPH_SF10,q149_copurchase_pagerank,q155_pagerank_converged_subgraph"
python3 tools/strip_sidecar.py /tmp/campaign11/b_sf10_b.json /tmp/campaign13/r11_sf10_b.json "$TOUCHED13,$GRAPH_SF10,q149_copurchase_pagerank,q155_pagerank_converged_subgraph"
# sf0.1 headline: the two fresh r13 JVMs, plus the two same-box r12 JVMs
# as extra storm-dodging samples for the 161 code-identical queries.
python3 tools/merge_bench.py /tmp/campaign13/m_sf01.json \
  /tmp/campaign13/b_sf01_a.json /tmp/campaign13/b_sf01_b.json \
  /tmp/campaign13/r12_sf01_a.json /tmp/campaign13/r12_sf01_b.json
python3 tools/merge_bench.py /tmp/campaign13/m_sf1.json \
  /tmp/campaign13/b_sf1_t.json /tmp/campaign13/r12_sf1_a.json
python3 tools/merge_bench.py /tmp/campaign13/m_sf3.json \
  /tmp/campaign13/b_sf3_t.json /tmp/campaign13/r12_sf3_a.json
python3 tools/merge_bench.py /tmp/campaign13/m_sf10.json \
  /tmp/campaign13/b_sf10_t.json /tmp/campaign13/e_q149_q155_sf10.json \
  /tmp/campaign13/e_q109_sf10.json /tmp/campaign12/e_q149_q155_sf10.json \
  /tmp/campaign11/e3_q109_sf10.json /tmp/campaign11/e_q110_sf10.json \
  /tmp/campaign13/r11_sf10_a.json /tmp/campaign13/r11_sf10_b.json
SCALING_NOTE="Round-13 matrix, per-query winning-JVM probe attribution throughout. All four scale points ran on THE SAME box as the r11/r12 campaigns (/tmp survived across rounds), so same-box leftover JVMs serve as extra storm-dodging samples for code-identical queries: sf0.1 = 2 fresh r13 full-board JVMs + the 2 r12 JVMs (touched ANN-lifecycle family q162-q166 stripped from the r12 inputs); sf1/sf3 = 1 fresh r13 JVM over the touched+new queries (q162-q169) merged with the r12 full-board JVM (touched family stripped — every other query is code-identical r12->r13); sf10 = fresh r13 JVMs for the touched family + the r12-graph-pin family (q150-q161) + dedicated q149+q155 and q109 samples, merged with the r11 sf10 heavy-subset JVMs (graph + lifecycle families stripped: those are the only queries whose code changed since r11) and the r11 dedicated q109/q110 samples. A stale-code wall can therefore never win a merge; every wall's probe is the probe of the JVM that produced it." \
python3 tools/scaling_report.py /tmp/campaign13/m_sf01.json /tmp/campaign13/m_sf1.json \
  /root/repo/SCALING.md /tmp/campaign13/m_sf3.json /tmp/campaign13/m_sf10.json
cp /tmp/campaign13/m_sf01.json /root/repo/BENCH_SIDECAR_r13.json
cp /tmp/campaign13/m_sf1.json  /root/repo/BENCH_SIDECAR_r13_sf1.json
cp /tmp/campaign13/m_sf3.json  /root/repo/BENCH_SIDECAR_r13_sf3.json
cp /tmp/campaign13/m_sf10.json /root/repo/BENCH_SIDECAR_r13_sf10.json
cp /tmp/campaign13/e_q149_q155_sf10.json /root/repo/BENCH_SIDECAR_r13_q149_q155_sf10.json
cp /tmp/campaign13/e_q109_sf10.json /root/repo/BENCH_SIDECAR_r13_q109_sf10.json
echo "=== phase C done ($(date +%H:%M:%S))"

echo "=== phase X: converged-PageRank extras ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign13/xconv_sf01.json "x_pagerank_converged"
bench /tmp/graft_sf1       /tmp/campaign13/xconv_sf1.json  "x_pagerank_converged"

echo "=== phase S3: sf10 chunked oracle sweep ($(date +%H:%M:%S))"
bash tools/run_r13_oracle.sh
echo "=== r13 campaign done ($(date +%H:%M:%S))"
