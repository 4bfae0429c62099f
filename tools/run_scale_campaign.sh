#!/bin/bash
# Round-7 scale campaign: full-board sf10 correctness (Verify dump + DuckDB
# oracle sweep with collapsed oracles for the five quadratic-oracle queries)
# followed by the four-point bench matrix, each scale measured across TWO
# independent fresh-JVM invocations and merged (tools/merge_bench.py) so the
# SCALING.md spread column bounds run-to-run variance.
#
# Run from /root/repo on an otherwise idle machine. Logs under /tmp/campaign.
set -u
cd /root/repo
mkdir -p /tmp/campaign

COLLAPSED="q127_cluster_canonical,q137_pareto_parts,q28_ngram_jaccard,q35_embedding_neardup,q69_embedding_clusters"
HEAVY="q103_zorder_nd_scan,q105_pmi_collocations,q109_gbt_train_score,q110_ann_recall,q114_price_bins,q117_audio_features,q120_table_maintenance,q122_copurchase,q124_sql_pricing_summary,q125_sql_top_revenue,q127_cluster_canonical,q12_window_moving,q130_mad_outliers,q138_stream_transitions,q139_weighted_median,q140_scd2_apply,q141_scd2_lookup,q143_session_paths,q144_stream_scd2,q145_stream_scd2_enrich,q16_scalar_funcs,q20_event_sessions,q25_token_stats,q26_quality_score,q28_ngram_jaccard,q30_minhash_neardup,q32_simhash_neardups,q43_bpe_tokens,q45_winnowing,q54_contamination,q60_salted_join,q63_bucketed_join,q66_profile,q68_repetition,q80_stream_sessions,q83_bigram_quality,q85_zorder_scan,q89_cdc_replica,q90_skipping_scan,q91_dup_spans,q92_pq_topk,q93_incremental_agg,q94_bpe_merges,q95_bpe_encode,q98_rank_distributions,q99_value_windows,q101_ivf_cold_lookup,q121_exact_substr_scrub"

echo "=== phase A: sf10 verify dump ($(date +%H:%M:%S))"
rm -rf /tmp/verify_sf10
SPARK_GRAFT_CPUS=32 timeout 7200 sbt -batch \
  "runMain graft.Verify /tmp/graft_sf10 /tmp/verify_sf10" \
  > /tmp/campaign/sf10_dump.log 2>&1
echo "dump exit=$? failures:"; grep -c "\[verify\].*failed" /tmp/campaign/sf10_dump.log

echo "=== phase A: sf10 naive oracle sweep ($(date +%H:%M:%S))"
ONLY=$(python3 - <<'EOF'
import json
names = sorted(json.load(open('/tmp/verify_sf10/oracle_sql.json')))
skip = set("q127_cluster_canonical q137_pareto_parts q28_ngram_jaccard q35_embedding_neardup q69_embedding_clusters".split())
print(",".join(n for n in names if n not in skip))
EOF
)
timeout 10800 python3 tools/check_oracle.py /tmp/graft_sf10 /tmp/verify_sf10 "$ONLY" \
  > /tmp/campaign/oracle_sf10_naive.log 2>&1
echo "naive oracle exit=$?"; tail -2 /tmp/campaign/oracle_sf10_naive.log

echo "=== phase A: sf10 collapsed oracles ($(date +%H:%M:%S))"
timeout 7200 python3 tools/check_pairs_collapsed.py /tmp/graft_sf10 /tmp/verify_sf10 \
  > /tmp/campaign/oracle_sf10_pairs.log 2>&1
echo "pairs exit=$?"
timeout 7200 python3 tools/check_q69_collapsed.py /tmp/graft_sf10 /tmp/verify_sf10 \
  > /tmp/campaign/oracle_sf10_q69.log 2>&1
echo "q69 exit=$?"
timeout 7200 python3 tools/check_q127_collapsed.py /tmp/graft_sf10 /tmp/verify_sf10 \
  > /tmp/campaign/oracle_sf10_q127.log 2>&1
echo "q127 exit=$?"
timeout 7200 python3 tools/check_q137_collapsed.py /tmp/graft_sf10 /tmp/verify_sf10 \
  > /tmp/campaign/oracle_sf10_q137.log 2>&1
echo "q137 exit=$?"

bench () { # $1 sfdir  $2 out.json  $3 only-filter (or empty)
  local envonly=()
  [ -n "$3" ] && envonly=(SPARK_GRAFT_ONLY="$3")
  env SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$2" \
      "${envonly[@]}" timeout 10800 sbt -batch "runMain graft.Bench" \
      > "/tmp/campaign/$(basename "$2" .json).log" 2>&1
  echo "bench $2 exit=$?"
}

echo "=== phase B: bench matrix ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign/b_sf01_a.json ""
bench /root/testdata/sf0.1 /tmp/campaign/b_sf01_b.json ""
bench /tmp/graft_sf1     /tmp/campaign/b_sf1_a.json  ""
bench /tmp/graft_sf1     /tmp/campaign/b_sf1_b.json  ""
bench /tmp/graft_sf3     /tmp/campaign/b_sf3_a.json  ""
bench /tmp/graft_sf3     /tmp/campaign/b_sf3_b.json  "$HEAVY"
bench /tmp/graft_sf10    /tmp/campaign/b_sf10_a.json ""
bench /tmp/graft_sf10    /tmp/campaign/b_sf10_b.json "$HEAVY"

echo "=== phase C: merge + report ($(date +%H:%M:%S))"
python3 tools/merge_bench.py /tmp/campaign/m_sf01.json /tmp/campaign/b_sf01_a.json /tmp/campaign/b_sf01_b.json
python3 tools/merge_bench.py /tmp/campaign/m_sf1.json  /tmp/campaign/b_sf1_a.json  /tmp/campaign/b_sf1_b.json
python3 tools/merge_bench.py /tmp/campaign/m_sf3.json  /tmp/campaign/b_sf3_a.json  /tmp/campaign/b_sf3_b.json
python3 tools/merge_bench.py /tmp/campaign/m_sf10.json /tmp/campaign/b_sf10_a.json /tmp/campaign/b_sf10_b.json
python3 tools/scaling_report.py /tmp/campaign/m_sf01.json /tmp/campaign/m_sf1.json \
  /root/repo/SCALING.md /tmp/campaign/m_sf3.json /tmp/campaign/m_sf10.json
echo "=== campaign done ($(date +%H:%M:%S))"
