#!/bin/bash
# Round-11 campaign — run AFTER tools/run_r11_verify.sh is green. Phases:
#
#   S2  sf3 touched dump + oracle (stack-routed PageRank family
#       q149/q151/q155/q160/q161, guarded q159, new q162/q163 rows-only)
#       -> CORRECTNESS_SF3_r11_touched.json
#   S3  sf10 FULL-BOARD dump + oracle (round-10 ask #7: keep the full
#       sf10 artifact fresh per round) -> CORRECTNESS_SF10_r11.json.
#       Known-infeasible exclusions unchanged: q149/q150 full-graph SQL
#       (DuckDB exhausts RAM above sf3; subgraph twins cover the code).
#   E   dedicated-JVM sf10 samples: q110 (round-10 ask #5 — settle its
#       4.4x decade on an idle box) and q149+q155 (ask #2 done-criterion:
#       stack-routed walls vs round-10's rebuild-per-query walls)
#   B   four-scale bench matrix, two fresh JVMs per scale; every sidecar
#       now carries box_calibration (round-10 ask #1)
#   X   converged-PageRank extras (per-round tracking; stack-routed)
#   C   merge + SCALING.md regeneration
#
# Logs under /tmp/campaign11.
set -u
cd /root/repo
mkdir -p /tmp/campaign11

SKIP_NAIVE="q127_cluster_canonical q137_pareto_parts q28_ngram_jaccard q35_embedding_neardup q69_embedding_clusters"
INFEASIBLE_SF10="q149_copurchase_pagerank q150_copurchase_components"

TOUCHED="q149_copurchase_pagerank,q151_pagerank_subgraph,q155_pagerank_converged_subgraph,q159_assortativity,q160_weighted_pagerank_subgraph,q161_ppr_subgraph,q162_ivf_admit,q163_ivf_compact"

HEAVY="q103_zorder_nd_scan,q105_pmi_collocations,q109_gbt_train_score,q110_ann_recall,q114_price_bins,q117_audio_features,q120_table_maintenance,q122_copurchase,q124_sql_pricing_summary,q125_sql_top_revenue,q127_cluster_canonical,q12_window_moving,q130_mad_outliers,q138_stream_transitions,q139_weighted_median,q140_scd2_apply,q141_scd2_lookup,q143_session_paths,q144_stream_scd2,q145_stream_scd2_enrich,q146_incremental_neardup,q147_filter_funnel,q148_stream_neardup,q149_copurchase_pagerank,q150_copurchase_components,q151_pagerank_subgraph,q152_components_subgraph,q153_copurchase_triangles,q154_link_prediction,q155_pagerank_converged_subgraph,q156_clustering_coefficient,q157_kcore,q158_tfidf_keywords,q159_assortativity,q160_weighted_pagerank_subgraph,q161_ppr_subgraph,q162_ivf_admit,q163_ivf_compact,q16_scalar_funcs,q20_event_sessions,q25_token_stats,q26_quality_score,q28_ngram_jaccard,q30_minhash_neardup,q32_simhash_neardups,q37_multimodal_features,q43_bpe_tokens,q45_winnowing,q54_contamination,q60_salted_join,q63_bucketed_join,q66_profile,q68_repetition,q80_stream_sessions,q83_bigram_quality,q85_zorder_scan,q89_cdc_replica,q90_skipping_scan,q91_dup_spans,q92_pq_topk,q93_incremental_agg,q94_bpe_merges,q95_bpe_encode,q98_rank_distributions,q99_value_windows,q101_ivf_cold_lookup,q121_exact_substr_scrub"

echo "=== phase S2: sf3 touched dump + oracle ($(date +%H:%M:%S))"
rm -rf /tmp/verify_r11_sf3
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$TOUCHED" timeout 7200 sbt -batch \
  "runMain graft.Verify /tmp/graft_sf3 /tmp/verify_r11_sf3" \
  > /tmp/campaign11/sf3_dump.log 2>&1
echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign11/sf3_dump.log)"
timeout 7200 python3 tools/check_oracle.py /tmp/graft_sf3 /tmp/verify_r11_sf3 \
  "q149_copurchase_pagerank,q151_pagerank_subgraph,q155_pagerank_converged_subgraph,q159_assortativity,q160_weighted_pagerank_subgraph,q161_ppr_subgraph" \
  > /tmp/campaign11/oracle_sf3_naive.log 2>&1
echo "sf3 naive exit=$?"; tail -2 /tmp/campaign11/oracle_sf3_naive.log
SCALE_LABEL="sf3 (30x sf0.1) - round-11 touched queries (PageRank family on the PERSISTED symmetrized stacks, guarded q159, new q162/q163 rows-only); full board is CORRECTNESS_SF3_r08" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF3_r11_touched.json /tmp/verify_r11_sf3 \
  /tmp/campaign11/oracle_sf3_naive.log

echo "=== phase S3: sf10 FULL-BOARD dump + oracle ($(date +%H:%M:%S))"
rm -rf /tmp/verify_r11_sf10
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 timeout 14400 sbt -batch \
  "runMain graft.Verify /tmp/graft_sf10 /tmp/verify_r11_sf10" \
  > /tmp/campaign11/sf10_dump.log 2>&1
echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign11/sf10_dump.log)"
ONLY=$(python3 - <<PYEOF
import json
names = sorted(json.load(open('/tmp/verify_r11_sf10/oracle_sql.json')))
skip = set("$SKIP_NAIVE".split()) | set("$INFEASIBLE_SF10".split())
print(",".join(n for n in names if n not in skip))
PYEOF
)
timeout 14400 python3 tools/check_oracle.py /tmp/graft_sf10 /tmp/verify_r11_sf10 "$ONLY" \
  > /tmp/campaign11/oracle_sf10_naive.log 2>&1
echo "sf10 naive exit=$?"; tail -2 /tmp/campaign11/oracle_sf10_naive.log
for t in pairs q69 q127 q137 q146; do
  timeout 7200 python3 tools/check_${t}_collapsed.py /tmp/graft_sf10 /tmp/verify_r11_sf10 \
    > /tmp/campaign11/oracle_sf10_${t}.log 2>&1
  echo "$t exit=$?: $(tail -1 /tmp/campaign11/oracle_sf10_${t}.log)"
done
SCALE_LABEL="sf10 (100x sf0.1, adversarial byte-identical replication) - FULL BOARD (round-10 ask #7: fresh per round). Excluded by documented DuckDB infeasibility, NOT engine failure: q149/q150 full-graph oracles (DuckDB exhausts RAM above sf3; the subgraph twins q151/q152/q155 oracle the same operator code at sf10)" \
python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF10_r11.json /tmp/verify_r11_sf10 \
  /tmp/campaign11/oracle_sf10_naive.log /tmp/campaign11/oracle_sf10_pairs.log \
  /tmp/campaign11/oracle_sf10_q69.log /tmp/campaign11/oracle_sf10_q127.log \
  /tmp/campaign11/oracle_sf10_q137.log /tmp/campaign11/oracle_sf10_q146.log

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
echo "=== r11 campaign done ($(date +%H:%M:%S))"
