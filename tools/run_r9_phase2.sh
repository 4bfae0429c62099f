#!/bin/bash
# Round-9 phases S + B + C — run AFTER the phase-P pin decision is applied
# (tools/run_r9_campaign.sh) and the default recompiled.
#
#   S  correctness at scale for the round's touched/new surface:
#      sf0.1 FULL board (dump + naive oracle + collapsed checkers), then
#      sf3 + sf10 targeted dumps for q146/q148/q151/q152 with
#      naive (q151/q152 — the new always-feasible graph oracles) and
#      collapsed (q146/q148) DuckDB checks -> CORRECTNESS_{SF3,SF10}_r09.
#      (q149/q150 math is untouched this round: their sf3 full-oracle
#      green stands from CORRECTNESS_SF3_r08; their naive sf10 SQL is the
#      documented DuckDB-infeasible case q151/q152 exist to cover.)
#   B  four-scale bench matrix, two fresh JVMs per scale, plus one
#      converged-PageRank extra at sf1 and sf0.1.
#   C  merge + SCALING.md regeneration.
#
# Logs under /tmp/campaign9.
set -u
cd /root/repo
mkdir -p /tmp/campaign9

SKIP_NAIVE="q127_cluster_canonical q137_pareto_parts q28_ngram_jaccard q35_embedding_neardup q69_embedding_clusters"

HEAVY="q103_zorder_nd_scan,q105_pmi_collocations,q109_gbt_train_score,q110_ann_recall,q114_price_bins,q117_audio_features,q120_table_maintenance,q122_copurchase,q124_sql_pricing_summary,q125_sql_top_revenue,q127_cluster_canonical,q12_window_moving,q130_mad_outliers,q138_stream_transitions,q139_weighted_median,q140_scd2_apply,q141_scd2_lookup,q143_session_paths,q144_stream_scd2,q145_stream_scd2_enrich,q146_incremental_neardup,q147_filter_funnel,q148_stream_neardup,q149_copurchase_pagerank,q150_copurchase_components,q151_pagerank_subgraph,q152_components_subgraph,q16_scalar_funcs,q20_event_sessions,q25_token_stats,q26_quality_score,q28_ngram_jaccard,q30_minhash_neardup,q32_simhash_neardups,q37_multimodal_features,q43_bpe_tokens,q45_winnowing,q54_contamination,q60_salted_join,q63_bucketed_join,q66_profile,q68_repetition,q80_stream_sessions,q83_bigram_quality,q85_zorder_scan,q89_cdc_replica,q90_skipping_scan,q91_dup_spans,q92_pq_topk,q93_incremental_agg,q94_bpe_merges,q95_bpe_encode,q98_rank_distributions,q99_value_windows,q101_ivf_cold_lookup,q121_exact_substr_scrub"

TOUCHED="q146_incremental_neardup,q148_stream_neardup,q151_pagerank_subgraph,q152_components_subgraph,q32_simhash_neardups"

echo "=== phase S1: sf0.1 full verify dump ($(date +%H:%M:%S))"
rm -rf /tmp/verify_r9_sf01
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 timeout 7200 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.1 /tmp/verify_r9_sf01" \
  > /tmp/campaign9/sf01_dump.log 2>&1
echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign9/sf01_dump.log)"

echo "=== phase S1: sf0.1 naive oracle sweep ($(date +%H:%M:%S))"
ONLY=$(python3 - <<EOF
import json
names = sorted(json.load(open('/tmp/verify_r9_sf01/oracle_sql.json')))
skip = set("$SKIP_NAIVE".split())
print(",".join(n for n in names if n not in skip))
EOF
)
timeout 7200 python3 tools/check_oracle.py /root/testdata/sf0.1 /tmp/verify_r9_sf01 "$ONLY" \
  > /tmp/campaign9/oracle_sf01_naive.log 2>&1
echo "naive exit=$?"; tail -2 /tmp/campaign9/oracle_sf01_naive.log
for t in pairs q69 q127 q137; do
  timeout 3600 python3 tools/check_${t}_collapsed.py /root/testdata/sf0.1 /tmp/verify_r9_sf01 \
    > /tmp/campaign9/oracle_sf01_${t}.log 2>&1
  echo "$t exit=$?: $(tail -1 /tmp/campaign9/oracle_sf01_${t}.log)"
done

echo "=== phase S2: sf3 touched dump + oracle ($(date +%H:%M:%S))"
rm -rf /tmp/verify_r9_sf3
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$TOUCHED" timeout 7200 sbt -batch \
  "runMain graft.Verify /tmp/graft_sf3 /tmp/verify_r9_sf3" \
  > /tmp/campaign9/sf3_dump.log 2>&1
echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign9/sf3_dump.log)"
timeout 7200 python3 tools/check_oracle.py /tmp/graft_sf3 /tmp/verify_r9_sf3 \
  "q151_pagerank_subgraph,q152_components_subgraph" \
  > /tmp/campaign9/oracle_sf3_graph.log 2>&1
echo "sf3 graph exit=$?"; tail -2 /tmp/campaign9/oracle_sf3_graph.log
timeout 7200 python3 tools/check_q146_collapsed.py /tmp/graft_sf3 /tmp/verify_r9_sf3 \
  > /tmp/campaign9/oracle_sf3_q146.log 2>&1
echo "sf3 q146/q148 exit=$?"; tail -3 /tmp/campaign9/oracle_sf3_q146.log
SCALE_LABEL="sf3 (30x sf0.1) - round-9 touched/new queries; full board is CORRECTNESS_SF3_r08" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF3_r09_touched.json /tmp/verify_r9_sf3 \
  /tmp/campaign9/oracle_sf3_graph.log /tmp/campaign9/oracle_sf3_q146.log

echo "=== phase S3: sf10 touched dump + oracle ($(date +%H:%M:%S))"
rm -rf /tmp/verify_r9_sf10
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$TOUCHED" timeout 7200 sbt -batch \
  "runMain graft.Verify /tmp/graft_sf10 /tmp/verify_r9_sf10" \
  > /tmp/campaign9/sf10_dump.log 2>&1
echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign9/sf10_dump.log)"
timeout 7200 python3 tools/check_oracle.py /tmp/graft_sf10 /tmp/verify_r9_sf10 \
  "q151_pagerank_subgraph,q152_components_subgraph" \
  > /tmp/campaign9/oracle_sf10_graph.log 2>&1
echo "sf10 graph exit=$?"; tail -2 /tmp/campaign9/oracle_sf10_graph.log
timeout 7200 python3 tools/check_q146_collapsed.py /tmp/graft_sf10 /tmp/verify_r9_sf10 \
  > /tmp/campaign9/oracle_sf10_q146.log 2>&1
echo "sf10 q146/q148 exit=$?"; tail -3 /tmp/campaign9/oracle_sf10_q146.log
SCALE_LABEL="sf10 (100x sf0.1) - round-9 touched/new queries; q151/q152 give the graph operators their first sf10-checked oracle" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF10_r09_touched.json /tmp/verify_r9_sf10 \
  /tmp/campaign9/oracle_sf10_graph.log /tmp/campaign9/oracle_sf10_q146.log

bench () { # $1 sfdir  $2 out.json  $3 only-filter (or empty)
  local envonly=()
  [ -n "$3" ] && envonly=(SPARK_GRAFT_ONLY="$3")
  env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$2" \
      "${envonly[@]}" timeout 10800 sbt -batch "runMain graft.Bench" \
      > "/tmp/campaign9/$(basename "$2" .json).log" 2>&1
  echo "bench $2 exit=$? ($(date +%H:%M:%S))"
}

echo "=== phase B: bench matrix, sf10-first ($(date +%H:%M:%S))"
bench /tmp/graft_sf10    /tmp/campaign9/b_sf10_a.json "$HEAVY"
bench /tmp/graft_sf10    /tmp/campaign9/b_sf10_b.json "$HEAVY"
bench /tmp/graft_sf3     /tmp/campaign9/b_sf3_a.json  ""
bench /tmp/graft_sf3     /tmp/campaign9/b_sf3_b.json  "$HEAVY"
bench /tmp/graft_sf1     /tmp/campaign9/b_sf1_a.json  ""
bench /tmp/graft_sf1     /tmp/campaign9/b_sf1_b.json  "$HEAVY"
bench /root/testdata/sf0.1 /tmp/campaign9/b_sf01_a.json ""
bench /root/testdata/sf0.1 /tmp/campaign9/b_sf01_b.json ""
echo "=== phase B extras: converged PageRank ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign9/xconv_sf01.json "x_pagerank_converged"
bench /tmp/graft_sf1       /tmp/campaign9/xconv_sf1.json  "x_pagerank_converged"

echo "=== phase C: merge + report ($(date +%H:%M:%S))"
python3 tools/merge_bench.py /tmp/campaign9/m_sf01.json /tmp/campaign9/b_sf01_a.json /tmp/campaign9/b_sf01_b.json
python3 tools/merge_bench.py /tmp/campaign9/m_sf1.json  /tmp/campaign9/b_sf1_a.json  /tmp/campaign9/b_sf1_b.json
python3 tools/merge_bench.py /tmp/campaign9/m_sf3.json  /tmp/campaign9/b_sf3_a.json  /tmp/campaign9/b_sf3_b.json
python3 tools/merge_bench.py /tmp/campaign9/m_sf10.json /tmp/campaign9/b_sf10_a.json /tmp/campaign9/b_sf10_b.json
python3 tools/scaling_report.py /tmp/campaign9/m_sf01.json /tmp/campaign9/m_sf1.json \
  /root/repo/SCALING.md /tmp/campaign9/m_sf3.json /tmp/campaign9/m_sf10.json
echo "=== phase S+B+C done ($(date +%H:%M:%S))"
