#!/bin/bash
# Round-12 bench phases B/X/C, trimmed+reordered for the remaining wall
# clock (cheap scales first so headline artifacts land early; one sf10
# HEAVY sample — the box probe makes single samples interpretable, and
# merge_bench merges whatever exists). Idempotent: each bench skips if
# its output exists.
set -u
cd /root/repo
mkdir -p /tmp/campaign12

HEAVY="q103_zorder_nd_scan,q105_pmi_collocations,q109_gbt_train_score,q110_ann_recall,q114_price_bins,q117_audio_features,q120_table_maintenance,q122_copurchase,q124_sql_pricing_summary,q125_sql_top_revenue,q127_cluster_canonical,q12_window_moving,q130_mad_outliers,q138_stream_transitions,q139_weighted_median,q140_scd2_apply,q141_scd2_lookup,q143_session_paths,q144_stream_scd2,q145_stream_scd2_enrich,q146_incremental_neardup,q147_filter_funnel,q148_stream_neardup,q149_copurchase_pagerank,q150_copurchase_components,q151_pagerank_subgraph,q152_components_subgraph,q153_copurchase_triangles,q154_link_prediction,q155_pagerank_converged_subgraph,q156_clustering_coefficient,q157_kcore,q158_tfidf_keywords,q159_assortativity,q160_weighted_pagerank_subgraph,q161_ppr_subgraph,q162_ivf_admit,q163_ivf_compact,q164_stream_ivf_admit,q165_ivf_delete,q166_pq_admit,q16_scalar_funcs,q20_event_sessions,q25_token_stats,q26_quality_score,q28_ngram_jaccard,q30_minhash_neardup,q32_simhash_neardups,q37_multimodal_features,q43_bpe_tokens,q45_winnowing,q54_contamination,q60_salted_join,q63_bucketed_join,q66_profile,q68_repetition,q80_stream_sessions,q83_bigram_quality,q85_zorder_scan,q89_cdc_replica,q90_skipping_scan,q91_dup_spans,q92_pq_topk,q93_incremental_agg,q94_bpe_merges,q95_bpe_encode,q98_rank_distributions,q99_value_windows,q101_ivf_cold_lookup,q121_exact_substr_scrub"

bench () { # $1 sfdir  $2 out.json  $3 only-filter (or empty)
  if [ -s "$2" ]; then echo "bench $2 SKIPPED (exists)"; return; fi
  local envonly=()
  [ -n "$3" ] && envonly=(SPARK_GRAFT_ONLY="$3")
  env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$2" \
      "${envonly[@]}" timeout 10800 sbt -batch "runMain graft.Bench" \
      > "/tmp/campaign12/$(basename "$2" .json).log" 2>&1
  echo "bench $2 exit=$? ($(date +%H:%M:%S))"
}

echo "=== phase B (trimmed, cheap-first) ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign12/b_sf01_a.json ""
bench /root/testdata/sf0.1 /tmp/campaign12/b_sf01_b.json ""
bench /root/testdata/sf0.1 /tmp/campaign12/xconv_sf01.json "x_pagerank_converged"
bench /tmp/graft_sf1     /tmp/campaign12/b_sf1_a.json  ""
bench /tmp/graft_sf1     /tmp/campaign12/xconv_sf1.json  "x_pagerank_converged"
bench /tmp/graft_sf3     /tmp/campaign12/b_sf3_a.json  ""
bench /tmp/graft_sf10    /tmp/campaign12/b_sf10_a.json "$HEAVY"
bench /tmp/graft_sf1     /tmp/campaign12/b_sf1_b.json  "$HEAVY"
bench /tmp/graft_sf10    /tmp/campaign12/b_sf10_b.json "$HEAVY"

echo "=== phase C: merge + report ($(date +%H:%M:%S))"
python3 tools/merge_bench.py /tmp/campaign12/m_sf01.json /tmp/campaign12/b_sf01_a.json /tmp/campaign12/b_sf01_b.json
python3 tools/merge_bench.py /tmp/campaign12/m_sf1.json  /tmp/campaign12/b_sf1_a.json  /tmp/campaign12/b_sf1_b.json
python3 tools/merge_bench.py /tmp/campaign12/m_sf3.json  /tmp/campaign12/b_sf3_a.json
python3 tools/merge_bench.py /tmp/campaign12/m_sf10.json /tmp/campaign12/b_sf10_a.json /tmp/campaign12/b_sf10_b.json
python3 tools/scaling_report.py /tmp/campaign12/m_sf01.json /tmp/campaign12/m_sf1.json \
  /root/repo/SCALING.md /tmp/campaign12/m_sf3.json /tmp/campaign12/m_sf10.json
echo "=== r12 bench done ($(date +%H:%M:%S))"
