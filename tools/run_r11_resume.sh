#!/bin/bash
# Round-11 matrix resumption. The finish script's orchestrating shell died
# (session restart) after launching phase B's first bench; the orphaned
# `sbt runMain graft.Bench` writing b_sf10_a.json keeps running with
# PPID=1. This script WAITS for that orphan, then runs the remaining
# matrix cheapest-first (so the scales SCALING.md requires are secured
# early on a box currently in a measured co-tenant storm — calibration
# probe 12.1 s vs 2.4 s two hours prior), merges what exists
# (merge_bench.py now skips missing inputs loudly), regenerates
# SCALING.md, and copies the merged sidecars into the repo.
set -u
cd /root/repo

echo "=== waiting for the orphaned b_sf10_a bench ($(date +%H:%M:%S))"
while pgrep -f 'runMain graft.Bench' > /dev/null; do sleep 30; done
echo "orphan done ($(date +%H:%M:%S)); b_sf10_a.json: $(ls -la /tmp/campaign11/b_sf10_a.json 2>&1)"

HEAVY="q103_zorder_nd_scan,q105_pmi_collocations,q109_gbt_train_score,q110_ann_recall,q114_price_bins,q117_audio_features,q120_table_maintenance,q122_copurchase,q124_sql_pricing_summary,q125_sql_top_revenue,q127_cluster_canonical,q12_window_moving,q130_mad_outliers,q138_stream_transitions,q139_weighted_median,q140_scd2_apply,q141_scd2_lookup,q143_session_paths,q144_stream_scd2,q145_stream_scd2_enrich,q146_incremental_neardup,q147_filter_funnel,q148_stream_neardup,q149_copurchase_pagerank,q150_copurchase_components,q151_pagerank_subgraph,q152_components_subgraph,q153_copurchase_triangles,q154_link_prediction,q155_pagerank_converged_subgraph,q156_clustering_coefficient,q157_kcore,q158_tfidf_keywords,q159_assortativity,q160_weighted_pagerank_subgraph,q161_ppr_subgraph,q162_ivf_admit,q163_ivf_compact,q16_scalar_funcs,q20_event_sessions,q25_token_stats,q26_quality_score,q28_ngram_jaccard,q30_minhash_neardup,q32_simhash_neardups,q37_multimodal_features,q43_bpe_tokens,q45_winnowing,q54_contamination,q60_salted_join,q63_bucketed_join,q66_profile,q68_repetition,q80_stream_sessions,q83_bigram_quality,q85_zorder_scan,q89_cdc_replica,q90_skipping_scan,q91_dup_spans,q92_pq_topk,q93_incremental_agg,q94_bpe_merges,q95_bpe_encode,q98_rank_distributions,q99_value_windows,q101_ivf_cold_lookup,q121_exact_substr_scrub"

bench () { # $1 sfdir  $2 out.json  $3 only-filter (or empty)
  if [ -s "$2" ]; then echo "bench $2 already exists, skipping"; return; fi
  local envonly=()
  [ -n "$3" ] && envonly=(SPARK_GRAFT_ONLY="$3")
  env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$2" \
      "${envonly[@]}" timeout 10800 sbt -batch "runMain graft.Bench" \
      > "/tmp/campaign11/$(basename "$2" .json).log" 2>&1
  echo "bench $2 exit=$? ($(date +%H:%M:%S))"
}

echo "=== phase B remainder, cheapest-first ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign11/b_sf01_a.json ""
bench /tmp/graft_sf1       /tmp/campaign11/b_sf1_a.json  ""
bench /tmp/graft_sf3       /tmp/campaign11/b_sf3_a.json  ""
bench /tmp/graft_sf10      /tmp/campaign11/b_sf10_b.json "$HEAVY"
bench /root/testdata/sf0.1 /tmp/campaign11/b_sf01_b.json ""
bench /tmp/graft_sf1       /tmp/campaign11/b_sf1_b.json  "$HEAVY"
bench /tmp/graft_sf3       /tmp/campaign11/b_sf3_b.json  "$HEAVY"

echo "=== phase X: converged-PageRank extras ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign11/xconv_sf01.json "x_pagerank_converged"
bench /tmp/graft_sf1       /tmp/campaign11/xconv_sf1.json  "x_pagerank_converged"

echo "=== phase C: merge + report ($(date +%H:%M:%S))"
python3 tools/merge_bench.py /tmp/campaign11/m_sf01.json /tmp/campaign11/b_sf01_a.json /tmp/campaign11/b_sf01_b.json
python3 tools/merge_bench.py /tmp/campaign11/m_sf1.json  /tmp/campaign11/b_sf1_a.json  /tmp/campaign11/b_sf1_b.json
python3 tools/merge_bench.py /tmp/campaign11/m_sf3.json  /tmp/campaign11/b_sf3_a.json  /tmp/campaign11/b_sf3_b.json
# sf10 merge folds in the committed dedicated-JVM samples (q110; q149+q155)
# the same way round 10 folded its D samples — min-across-JVMs estimator.
python3 tools/merge_bench.py /tmp/campaign11/m_sf10.json \
  /tmp/campaign11/b_sf10_a.json /tmp/campaign11/b_sf10_b.json \
  /root/repo/BENCH_SIDECAR_r11_q110_sf10.json \
  /root/repo/BENCH_SIDECAR_r11_q149_q155_sf10.json
for s in sf01 sf1 sf3 sf10; do
  dst="BENCH_SIDECAR_r11_${s}.json"; [ "$s" = sf01 ] && dst="BENCH_SIDECAR_r11.json"
  [ -s "/tmp/campaign11/m_${s}.json" ] && cp "/tmp/campaign11/m_${s}.json" "/root/repo/$dst"
done
python3 tools/scaling_report.py /tmp/campaign11/m_sf01.json /tmp/campaign11/m_sf1.json \
  /root/repo/SCALING.md /tmp/campaign11/m_sf3.json /tmp/campaign11/m_sf10.json
echo "=== r11 resume done ($(date +%H:%M:%S))"
