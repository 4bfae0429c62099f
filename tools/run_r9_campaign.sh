#!/bin/bash
# Round-9 campaign. Order matters: the q149 pin decision (phase P) gates the
# bench matrix, so it runs first; correctness for the round's new/touched
# queries runs at sf0.1 (gate parity) and at sf10 (the round's headline:
# q151/q152 give the graph family a DuckDB-feasible oracle at EVERY scale).
#
# Phases:
#   P  q149 edge-pin A/B at sf10 (MEMORY_AND_DISK vs DISK_ONLY, fresh JVMs)
#   Q  q32 clean re-measure at sf3 + sf10 (new content collapse)
#   R  q148-vs-q146 gap at sf0.1 (persisted-index load path)
#   S  sf10 + sf3 oracle for q151/q152 and the round's touched queries
#   B  four-scale bench matrix, two fresh JVMs per scale, merged
#   C  merge + SCALING.md regeneration
#
# Run from /root/repo on an otherwise idle machine. Logs under /tmp/campaign9.
set -u
cd /root/repo
mkdir -p /tmp/campaign9

HEAVY="q103_zorder_nd_scan,q105_pmi_collocations,q109_gbt_train_score,q110_ann_recall,q114_price_bins,q117_audio_features,q120_table_maintenance,q122_copurchase,q124_sql_pricing_summary,q125_sql_top_revenue,q127_cluster_canonical,q12_window_moving,q130_mad_outliers,q138_stream_transitions,q139_weighted_median,q140_scd2_apply,q141_scd2_lookup,q143_session_paths,q144_stream_scd2,q145_stream_scd2_enrich,q146_incremental_neardup,q147_filter_funnel,q148_stream_neardup,q149_copurchase_pagerank,q150_copurchase_components,q151_pagerank_subgraph,q152_components_subgraph,q16_scalar_funcs,q20_event_sessions,q25_token_stats,q26_quality_score,q28_ngram_jaccard,q30_minhash_neardup,q32_simhash_neardups,q37_multimodal_features,q43_bpe_tokens,q45_winnowing,q54_contamination,q60_salted_join,q63_bucketed_join,q66_profile,q68_repetition,q80_stream_sessions,q83_bigram_quality,q85_zorder_scan,q89_cdc_replica,q90_skipping_scan,q91_dup_spans,q92_pq_topk,q93_incremental_agg,q94_bpe_merges,q95_bpe_encode,q98_rank_distributions,q99_value_windows,q101_ivf_cold_lookup,q121_exact_substr_scrub"

# Queries round 9 touched (code-path changes), for the scale oracle sweeps.
TOUCHED="q149_copurchase_pagerank,q150_copurchase_components,q151_pagerank_subgraph,q152_components_subgraph,q148_stream_neardup,q146_incremental_neardup,q32_simhash_neardups"

bench () { # $1 sfdir  $2 out.json  $3 only-filter (or empty)  [$4 extra-env]
  local envextra=()
  [ -n "$3" ] && envextra+=(SPARK_GRAFT_ONLY="$3")
  [ -n "${4:-}" ] && envextra+=($4)
  env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$2" \
      "${envextra[@]}" timeout 10800 sbt -batch "runMain graft.Bench" \
      > "/tmp/campaign9/$(basename "$2" .json).log" 2>&1
  echo "bench $2 exit=$? ($(date +%H:%M:%S))"
}

echo "=== phase P: q149 pin A/B at sf10 ($(date +%H:%M:%S))"
bench /tmp/graft_sf10 /tmp/campaign9/p_mad_a.json  "q149_copurchase_pagerank" "SPARK_GRAFT_GRAPH_PIN=MEMORY_AND_DISK"
bench /tmp/graft_sf10 /tmp/campaign9/p_disk_a.json "q149_copurchase_pagerank" "SPARK_GRAFT_GRAPH_PIN=DISK_ONLY"
bench /tmp/graft_sf10 /tmp/campaign9/p_mad_b.json  "q149_copurchase_pagerank" "SPARK_GRAFT_GRAPH_PIN=MEMORY_AND_DISK"
bench /tmp/graft_sf10 /tmp/campaign9/p_disk_b.json "q149_copurchase_pagerank" "SPARK_GRAFT_GRAPH_PIN=DISK_ONLY"
for f in p_mad_a p_disk_a p_mad_b p_disk_b; do
  echo "$f: $(grep -o '"runs":{[^}]*}' /tmp/campaign9/$f.json 2>/dev/null)"
done
echo "=== PIN DECISION POINT: inspect the four files above, set the default, recompile, then run phase QRSBC ==="
