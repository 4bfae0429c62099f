#!/bin/bash
# Round-11 finishing campaign. The first run (tools/run_r11_campaign.sh)
# completed S2 and the sf10 dump, but (a) the sf10 NAIVE oracle sweep was
# OOM-killed by the kernel mid-list while grinding q148's recursive
# near-dup SQL — q146/q148 naive SQL is now excluded up front (their
# collapsed checker, green since round 8, is the documented route), and
# the sweep RESUMES at the first unchecked name; (b) every bench run died
# in the box-calibration warm-up (ANSI long overflow, fixed in source).
#
# Inputs expected from the first run (all under /tmp/campaign11):
#   oracle_sf10_naive.log   52 OK lines (partial sweep, no FAILs written)
#   oracle_sf10_{pairs,q69,q127,q137,q146}.log   collapsed checkers, green
#   naive_remaining.txt     comma list of the 80 unchecked oracle names
set -u
cd /root/repo

echo "=== resume sf10 naive sweep ($(date +%H:%M:%S))"
timeout 14400 python3 tools/check_oracle.py /tmp/graft_sf10 /tmp/verify_r11_sf10 \
  "$(cat /tmp/campaign11/naive_remaining.txt)" \
  > /tmp/campaign11/oracle_sf10_naive2.log 2>&1
echo "sf10 naive-resume exit=$?"; tail -2 /tmp/campaign11/oracle_sf10_naive2.log
SCALE_LABEL="sf10 (100x sf0.1, adversarial byte-identical replication) - FULL BOARD (round-10 ask #7: fresh per round). Excluded by documented DuckDB infeasibility, NOT engine failure: q149/q150 full-graph oracles and q146/q148 NAIVE recursive SQL (DuckDB exhausts RAM above sf3 - the kernel OOM-killed the first sweep attempt on q148; q146/q148 are green via their collapsed checker below, the route used since round 8, and the subgraph twins q151/q152/q155 oracle the full-graph operator code at sf10)" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF10_r11.json /tmp/verify_r11_sf10 \
  /tmp/campaign11/oracle_sf10_naive.log /tmp/campaign11/oracle_sf10_naive2.log \
  /tmp/campaign11/oracle_sf10_pairs.log /tmp/campaign11/oracle_sf10_q69.log \
  /tmp/campaign11/oracle_sf10_q127.log /tmp/campaign11/oracle_sf10_q137.log \
  /tmp/campaign11/oracle_sf10_q146.log

HEAVY="q103_zorder_nd_scan,q105_pmi_collocations,q109_gbt_train_score,q110_ann_recall,q114_price_bins,q117_audio_features,q120_table_maintenance,q122_copurchase,q124_sql_pricing_summary,q125_sql_top_revenue,q127_cluster_canonical,q12_window_moving,q130_mad_outliers,q138_stream_transitions,q139_weighted_median,q140_scd2_apply,q141_scd2_lookup,q143_session_paths,q144_stream_scd2,q145_stream_scd2_enrich,q146_incremental_neardup,q147_filter_funnel,q148_stream_neardup,q149_copurchase_pagerank,q150_copurchase_components,q151_pagerank_subgraph,q152_components_subgraph,q153_copurchase_triangles,q154_link_prediction,q155_pagerank_converged_subgraph,q156_clustering_coefficient,q157_kcore,q158_tfidf_keywords,q159_assortativity,q160_weighted_pagerank_subgraph,q161_ppr_subgraph,q162_ivf_admit,q163_ivf_compact,q16_scalar_funcs,q20_event_sessions,q25_token_stats,q26_quality_score,q28_ngram_jaccard,q30_minhash_neardup,q32_simhash_neardups,q37_multimodal_features,q43_bpe_tokens,q45_winnowing,q54_contamination,q60_salted_join,q63_bucketed_join,q66_profile,q68_repetition,q80_stream_sessions,q83_bigram_quality,q85_zorder_scan,q89_cdc_replica,q90_skipping_scan,q91_dup_spans,q92_pq_topk,q93_incremental_agg,q94_bpe_merges,q95_bpe_encode,q98_rank_distributions,q99_value_windows,q101_ivf_cold_lookup,q121_exact_substr_scrub"

bench () { # $1 sfdir  $2 out.json  $3 only-filter (or empty)
  local envonly=()
  [ -n "$3" ] && envonly=(SPARK_GRAFT_ONLY="$3")
  env SPARK_DRIVER_MEM=32g SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 \
      SPARK_GRAFT_BENCH_OUT="$2" \
      "${envonly[@]}" timeout 10800 sbt -batch "runMain graft.Bench" \
      > "/tmp/campaign11/$(basename "$2" .json).log" 2>&1
  echo "bench $2 exit=$? ($(date +%H:%M:%S))"
}

echo "=== phase E: dedicated sf10 samples ($(date +%H:%M:%S))"
bench /tmp/graft_sf10 /tmp/campaign11/e_q110_sf10.json "q110_ann_recall"
bench /tmp/graft_sf10 /tmp/campaign11/e_q149_q155_sf10.json "q149_copurchase_pagerank,q155_pagerank_converged_subgraph"

echo "=== phase B: bench matrix, sf10-first ($(date +%H:%M:%S))"
bench /tmp/graft_sf10    /tmp/campaign11/b_sf10_a.json "$HEAVY"
bench /tmp/graft_sf10    /tmp/campaign11/b_sf10_b.json "$HEAVY"
bench /tmp/graft_sf3     /tmp/campaign11/b_sf3_a.json  ""
bench /tmp/graft_sf3     /tmp/campaign11/b_sf3_b.json  "$HEAVY"
bench /tmp/graft_sf1     /tmp/campaign11/b_sf1_a.json  ""
bench /tmp/graft_sf1     /tmp/campaign11/b_sf1_b.json  "$HEAVY"
bench /root/testdata/sf0.1 /tmp/campaign11/b_sf01_a.json ""
bench /root/testdata/sf0.1 /tmp/campaign11/b_sf01_b.json ""

echo "=== phase X: converged-PageRank extras ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign11/xconv_sf01.json "x_pagerank_converged"
bench /tmp/graft_sf1       /tmp/campaign11/xconv_sf1.json  "x_pagerank_converged"

echo "=== phase C: merge + report ($(date +%H:%M:%S))"
python3 tools/merge_bench.py /tmp/campaign11/m_sf01.json /tmp/campaign11/b_sf01_a.json /tmp/campaign11/b_sf01_b.json
python3 tools/merge_bench.py /tmp/campaign11/m_sf1.json  /tmp/campaign11/b_sf1_a.json  /tmp/campaign11/b_sf1_b.json
python3 tools/merge_bench.py /tmp/campaign11/m_sf3.json  /tmp/campaign11/b_sf3_a.json  /tmp/campaign11/b_sf3_b.json
python3 tools/merge_bench.py /tmp/campaign11/m_sf10.json /tmp/campaign11/b_sf10_a.json /tmp/campaign11/b_sf10_b.json
python3 tools/scaling_report.py /tmp/campaign11/m_sf01.json /tmp/campaign11/m_sf1.json \
  /root/repo/SCALING.md /tmp/campaign11/m_sf3.json /tmp/campaign11/m_sf10.json
echo "=== r11 finish done ($(date +%H:%M:%S))"
