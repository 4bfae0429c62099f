#!/bin/bash
# Round-8 campaign: correctness at scale first (sf3 FULL board including
# q149's new MATERIALIZED-CTE oracle and the new q150; then an sf10
# targeted sweep over every query this round touched), then the four-point
# bench matrix, two fresh-JVM invocations per scale, merged
# (tools/merge_bench.py) -> SCALING.md.
#
# Run from /root/repo on an otherwise idle machine. Logs under /tmp/campaign8.
set -u
cd /root/repo
mkdir -p /tmp/campaign8

# Quadratic-oracle queries checked via the collapsed-oracle scripts instead
# of naive SQL (unchanged from round 7).
SKIP_NAIVE="q127_cluster_canonical q137_pareto_parts q28_ngram_jaccard q35_embedding_neardup q69_embedding_clusters"

# Heavy subset for the second sf3 invocation and both sf10 invocations:
# round 7's list + the round-8 additions (q150) and touched queries.
HEAVY="q103_zorder_nd_scan,q105_pmi_collocations,q109_gbt_train_score,q110_ann_recall,q114_price_bins,q117_audio_features,q120_table_maintenance,q122_copurchase,q124_sql_pricing_summary,q125_sql_top_revenue,q127_cluster_canonical,q12_window_moving,q130_mad_outliers,q138_stream_transitions,q139_weighted_median,q140_scd2_apply,q141_scd2_lookup,q143_session_paths,q144_stream_scd2,q145_stream_scd2_enrich,q146_incremental_neardup,q147_filter_funnel,q148_stream_neardup,q149_copurchase_pagerank,q150_copurchase_components,q16_scalar_funcs,q20_event_sessions,q25_token_stats,q26_quality_score,q28_ngram_jaccard,q30_minhash_neardup,q32_simhash_neardups,q37_multimodal_features,q43_bpe_tokens,q45_winnowing,q54_contamination,q60_salted_join,q63_bucketed_join,q66_profile,q68_repetition,q80_stream_sessions,q83_bigram_quality,q85_zorder_scan,q89_cdc_replica,q90_skipping_scan,q91_dup_spans,q92_pq_topk,q93_incremental_agg,q94_bpe_merges,q95_bpe_encode,q98_rank_distributions,q99_value_windows,q101_ivf_cold_lookup,q121_exact_substr_scrub"

# Every query round 8 touched: the sf10 targeted correctness sweep.
TOUCHED="q149_copurchase_pagerank,q150_copurchase_components,q117_audio_features,q43_bpe_tokens,q37_multimodal_features,q144_stream_scd2,q145_stream_scd2_enrich,q146_incremental_neardup,q148_stream_neardup,q34_ivf_topk,q67_ivf_knn,q92_pq_topk,q101_ivf_cold_lookup,q110_ann_recall,q32_simhash_neardups"

echo "=== phase A: sf3 full verify dump ($(date +%H:%M:%S))"
rm -rf /tmp/verify_sf3_r8
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 timeout 7200 sbt -batch \
  "runMain graft.Verify /tmp/graft_sf3 /tmp/verify_sf3_r8" \
  > /tmp/campaign8/sf3_dump.log 2>&1
echo "dump exit=$? failures:"; grep -c "\[verify\].*failed" /tmp/campaign8/sf3_dump.log

echo "=== phase A: sf3 naive oracle sweep ($(date +%H:%M:%S))"
ONLY=$(python3 - <<EOF
import json
names = sorted(json.load(open('/tmp/verify_sf3_r8/oracle_sql.json')))
skip = set("$SKIP_NAIVE".split())
print(",".join(n for n in names if n not in skip))
EOF
)
timeout 10800 python3 tools/check_oracle.py /tmp/graft_sf3 /tmp/verify_sf3_r8 "$ONLY" \
  > /tmp/campaign8/oracle_sf3_naive.log 2>&1
echo "naive oracle exit=$?"; tail -2 /tmp/campaign8/oracle_sf3_naive.log

echo "=== phase A: sf3 collapsed oracles ($(date +%H:%M:%S))"
for t in pairs q69 q127 q137; do
  timeout 7200 python3 tools/check_${t}_collapsed.py /tmp/graft_sf3 /tmp/verify_sf3_r8 \
    > /tmp/campaign8/oracle_sf3_${t}.log 2>&1
  echo "$t exit=$?"
done

SCALE_LABEL="sf3 (30x sf0.1, adversarial byte-identical replication)" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF3_r08.json /tmp/verify_sf3_r8 \
  /tmp/campaign8/oracle_sf3_naive.log /tmp/campaign8/oracle_sf3_pairs.log \
  /tmp/campaign8/oracle_sf3_q69.log /tmp/campaign8/oracle_sf3_q127.log \
  /tmp/campaign8/oracle_sf3_q137.log

echo "=== phase A2: sf10 touched-query dump + oracle ($(date +%H:%M:%S))"
rm -rf /tmp/verify_sf10_r8
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$TOUCHED" timeout 7200 sbt -batch \
  "runMain graft.Verify /tmp/graft_sf10 /tmp/verify_sf10_r8" \
  > /tmp/campaign8/sf10_dump.log 2>&1
echo "dump exit=$? failures:"; grep -c "\[verify\].*failed" /tmp/campaign8/sf10_dump.log
# Of the touched set, these have naive oracles (q37/q34/q67/q92/q101/q110
# are contractually no-oracle; q32 likewise). q146/q148 are NOT here: their
# naive SQL's candidate join is quadratic in the duplication factor — on the
# 97%-duplicated sf10 corpus it runs DuckDB out of the whole 125G (measured
# this round, killed after an hour). They go through the duplication-
# collapsed checker below, the sf-scale path round 7 validated collapsed-
# vs-naive at the sf0.1 gate.
SF10_ORACLE="q149_copurchase_pagerank,q150_copurchase_components,q117_audio_features,q43_bpe_tokens,q144_stream_scd2,q145_stream_scd2_enrich"
timeout 10800 python3 tools/check_oracle.py /tmp/graft_sf10 /tmp/verify_sf10_r8 "$SF10_ORACLE" \
  > /tmp/campaign8/oracle_sf10_touched.log 2>&1
echo "sf10 touched oracle exit=$?"; tail -2 /tmp/campaign8/oracle_sf10_touched.log
timeout 7200 python3 tools/check_q146_collapsed.py /tmp/graft_sf10 /tmp/verify_sf10_r8 \
  > /tmp/campaign8/oracle_sf10_q146.log 2>&1
echo "sf10 q146/q148 collapsed exit=$?"; tail -3 /tmp/campaign8/oracle_sf10_q146.log
SCALE_LABEL="sf10 (100x sf0.1) - round-8 touched queries only; full board is CORRECTNESS_SF10_r07" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF10_r08_touched.json /tmp/verify_sf10_r8 \
  /tmp/campaign8/oracle_sf10_touched.log /tmp/campaign8/oracle_sf10_q146.log

bench () { # $1 sfdir  $2 out.json  $3 only-filter (or empty)
  local envonly=()
  [ -n "$3" ] && envonly=(SPARK_GRAFT_ONLY="$3")
  env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$2" \
      "${envonly[@]}" timeout 10800 sbt -batch "runMain graft.Bench" \
      > "/tmp/campaign8/$(basename "$2" .json).log" 2>&1
  echo "bench $2 exit=$? ($(date +%H:%M:%S))"
}

echo "=== phase B: bench matrix ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign8/b_sf01_a.json ""
bench /root/testdata/sf0.1 /tmp/campaign8/b_sf01_b.json ""
bench /tmp/graft_sf1     /tmp/campaign8/b_sf1_a.json  ""
bench /tmp/graft_sf1     /tmp/campaign8/b_sf1_b.json  "$HEAVY"
bench /tmp/graft_sf3     /tmp/campaign8/b_sf3_a.json  ""
bench /tmp/graft_sf3     /tmp/campaign8/b_sf3_b.json  "$HEAVY"
bench /tmp/graft_sf10    /tmp/campaign8/b_sf10_a.json "$HEAVY"
bench /tmp/graft_sf10    /tmp/campaign8/b_sf10_b.json "$HEAVY"

echo "=== phase C: merge + report ($(date +%H:%M:%S))"
python3 tools/merge_bench.py /tmp/campaign8/m_sf01.json /tmp/campaign8/b_sf01_a.json /tmp/campaign8/b_sf01_b.json
python3 tools/merge_bench.py /tmp/campaign8/m_sf1.json  /tmp/campaign8/b_sf1_a.json  /tmp/campaign8/b_sf1_b.json
python3 tools/merge_bench.py /tmp/campaign8/m_sf3.json  /tmp/campaign8/b_sf3_a.json  /tmp/campaign8/b_sf3_b.json
python3 tools/merge_bench.py /tmp/campaign8/m_sf10.json /tmp/campaign8/b_sf10_a.json /tmp/campaign8/b_sf10_b.json
python3 tools/scaling_report.py /tmp/campaign8/m_sf01.json /tmp/campaign8/m_sf1.json \
  /root/repo/SCALING.md /tmp/campaign8/m_sf3.json /tmp/campaign8/m_sf10.json
echo "=== campaign done ($(date +%H:%M:%S))"
