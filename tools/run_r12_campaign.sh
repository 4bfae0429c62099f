#!/bin/bash
# Round-12 campaign — run AFTER tools/run_r12_verify.sh is green. Phases:
#
#   S2  sf3 touched dump + oracle (src-partitioned-pin PageRank family
#       q149/q151/q155/q160/q161 with oracles; new lifecycle rows
#       q164/q165/q166 rows-only) -> CORRECTNESS_SF3_r12_touched.json
#   S3  sf10 FULL-BOARD dump + oracle (ask #7: keep the artifact fresh)
#       -> CORRECTNESS_SF10_r12.json. Known-infeasible exclusions
#       unchanged: q149/q150 full-graph SQL (DuckDB RAM above sf3;
#       subgraph twins cover the operator code at sf10).
#   E   dedicated-JVM sf10 samples: q149+q155 (ask #1 done-criterion:
#       src-partitioned pin vs r11's file-split pin, probe-normalized)
#   B   four-scale bench matrix, two fresh JVMs per scale, every sidecar
#       carrying box_calibration
#   X   converged-PageRank extras (per-round tracking)
#   C   merge (per-query probe attribution) + SCALING.md regeneration
#
# Every step checks for its own output and skips if present (idempotent
# resume after a killed session — the r11 lesson). Logs /tmp/campaign12.
set -u
cd /root/repo
mkdir -p /tmp/campaign12

SKIP_NAIVE="q127_cluster_canonical q137_pareto_parts q28_ngram_jaccard q35_embedding_neardup q69_embedding_clusters"
INFEASIBLE_SF10="q149_copurchase_pagerank q150_copurchase_components"

TOUCHED="q149_copurchase_pagerank,q151_pagerank_subgraph,q155_pagerank_converged_subgraph,q160_weighted_pagerank_subgraph,q161_ppr_subgraph,q162_ivf_admit,q163_ivf_compact,q164_stream_ivf_admit,q165_ivf_delete,q166_pq_admit"
TOUCHED_ORACLED="q149_copurchase_pagerank,q151_pagerank_subgraph,q155_pagerank_converged_subgraph,q160_weighted_pagerank_subgraph,q161_ppr_subgraph"

HEAVY="q103_zorder_nd_scan,q105_pmi_collocations,q109_gbt_train_score,q110_ann_recall,q114_price_bins,q117_audio_features,q120_table_maintenance,q122_copurchase,q124_sql_pricing_summary,q125_sql_top_revenue,q127_cluster_canonical,q12_window_moving,q130_mad_outliers,q138_stream_transitions,q139_weighted_median,q140_scd2_apply,q141_scd2_lookup,q143_session_paths,q144_stream_scd2,q145_stream_scd2_enrich,q146_incremental_neardup,q147_filter_funnel,q148_stream_neardup,q149_copurchase_pagerank,q150_copurchase_components,q151_pagerank_subgraph,q152_components_subgraph,q153_copurchase_triangles,q154_link_prediction,q155_pagerank_converged_subgraph,q156_clustering_coefficient,q157_kcore,q158_tfidf_keywords,q159_assortativity,q160_weighted_pagerank_subgraph,q161_ppr_subgraph,q162_ivf_admit,q163_ivf_compact,q164_stream_ivf_admit,q165_ivf_delete,q166_pq_admit,q16_scalar_funcs,q20_event_sessions,q25_token_stats,q26_quality_score,q28_ngram_jaccard,q30_minhash_neardup,q32_simhash_neardups,q37_multimodal_features,q43_bpe_tokens,q45_winnowing,q54_contamination,q60_salted_join,q63_bucketed_join,q66_profile,q68_repetition,q80_stream_sessions,q83_bigram_quality,q85_zorder_scan,q89_cdc_replica,q90_skipping_scan,q91_dup_spans,q92_pq_topk,q93_incremental_agg,q94_bpe_merges,q95_bpe_encode,q98_rank_distributions,q99_value_windows,q101_ivf_cold_lookup,q121_exact_substr_scrub"

if [ -s /root/repo/CORRECTNESS_SF3_r12_touched.json ]; then
  echo "=== phase S2 SKIPPED (artifact exists)"
else
  echo "=== phase S2: sf3 touched dump + oracle ($(date +%H:%M:%S))"
  rm -rf /tmp/verify_r12_sf3
  SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$TOUCHED" timeout 7200 sbt -batch \
    "runMain graft.Verify /tmp/graft_sf3 /tmp/verify_r12_sf3" \
    > /tmp/campaign12/sf3_dump.log 2>&1
  echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign12/sf3_dump.log)"
  timeout 7200 python3 tools/check_oracle.py /tmp/graft_sf3 /tmp/verify_r12_sf3 \
    "$TOUCHED_ORACLED" > /tmp/campaign12/oracle_sf3_naive.log 2>&1
  echo "sf3 naive exit=$?"; tail -2 /tmp/campaign12/oracle_sf3_naive.log
  SCALE_LABEL="sf3 (30x sf0.1) - round-12 touched queries (PageRank family on SRC-PARTITIONED pinned stacks - result-identical plan change; new ANN lifecycle rows q164/q165/q166 rows-only by design, exact-equality spec-backed); full board is CORRECTNESS_SF3_r08" \
  python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF3_r12_touched.json /tmp/verify_r12_sf3 \
    /tmp/campaign12/oracle_sf3_naive.log
fi

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

echo "=== phase E: dedicated sf10 samples ($(date +%H:%M:%S))"
bench /tmp/graft_sf10 /tmp/campaign12/e_q149_q155_sf10.json "q149_copurchase_pagerank,q155_pagerank_converged_subgraph"

if [ -s /root/repo/CORRECTNESS_SF10_r12.json ]; then
  echo "=== phase S3 SKIPPED (artifact exists)"
else
  echo "=== phase S3: sf10 FULL-BOARD dump + oracle ($(date +%H:%M:%S))"
  if [ -s /tmp/verify_r12_sf10/oracle_sql.json ]; then
    echo "sf10 dump exists, skipping"
  else
    rm -rf /tmp/verify_r12_sf10
    SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 timeout 14400 sbt -batch \
      "runMain graft.Verify /tmp/graft_sf10 /tmp/verify_r12_sf10" \
      > /tmp/campaign12/sf10_dump.log 2>&1
    echo "dump exit=$? failures: $(grep -c '\[verify\].*failed' /tmp/campaign12/sf10_dump.log)"
  fi
  ONLY=$(python3 - <<PYEOF
import json
names = sorted(json.load(open('/tmp/verify_r12_sf10/oracle_sql.json')))
skip = set("$SKIP_NAIVE".split()) | set("$INFEASIBLE_SF10".split())
print(",".join(n for n in names if n not in skip))
PYEOF
)
  timeout 14400 python3 tools/check_oracle.py /tmp/graft_sf10 /tmp/verify_r12_sf10 "$ONLY" \
    > /tmp/campaign12/oracle_sf10_naive.log 2>&1
  echo "sf10 naive exit=$?"; tail -2 /tmp/campaign12/oracle_sf10_naive.log
  for t in pairs q69 q127 q137 q146; do
    timeout 7200 python3 tools/check_${t}_collapsed.py /tmp/graft_sf10 /tmp/verify_r12_sf10 \
      > /tmp/campaign12/oracle_sf10_${t}.log 2>&1
    echo "$t exit=$?: $(tail -1 /tmp/campaign12/oracle_sf10_${t}.log)"
  done
  SCALE_LABEL="sf10 (100x sf0.1, adversarial byte-identical replication) - FULL BOARD (ask #7: fresh per round). Excluded by documented DuckDB infeasibility, NOT engine failure: q149/q150 full-graph oracles (DuckDB exhausts RAM above sf3; the subgraph twins q151/q152/q155 oracle the same operator code at sf10)" \
  python3 tools/build_sf3_artifact.py /root/repo/CORRECTNESS_SF10_r12.json /tmp/verify_r12_sf10 \
    /tmp/campaign12/oracle_sf10_naive.log /tmp/campaign12/oracle_sf10_pairs.log \
    /tmp/campaign12/oracle_sf10_q69.log /tmp/campaign12/oracle_sf10_q127.log \
    /tmp/campaign12/oracle_sf10_q137.log /tmp/campaign12/oracle_sf10_q146.log
fi

echo "=== phase B: bench matrix, sf10-first ($(date +%H:%M:%S))"
bench /tmp/graft_sf10    /tmp/campaign12/b_sf10_a.json "$HEAVY"
bench /tmp/graft_sf10    /tmp/campaign12/b_sf10_b.json "$HEAVY"
bench /tmp/graft_sf3     /tmp/campaign12/b_sf3_a.json  ""
bench /tmp/graft_sf3     /tmp/campaign12/b_sf3_b.json  "$HEAVY"
bench /tmp/graft_sf1     /tmp/campaign12/b_sf1_a.json  ""
bench /tmp/graft_sf1     /tmp/campaign12/b_sf1_b.json  "$HEAVY"
bench /root/testdata/sf0.1 /tmp/campaign12/b_sf01_a.json ""
bench /root/testdata/sf0.1 /tmp/campaign12/b_sf01_b.json ""

echo "=== phase X: converged-PageRank extras ($(date +%H:%M:%S))"
bench /root/testdata/sf0.1 /tmp/campaign12/xconv_sf01.json "x_pagerank_converged"
bench /tmp/graft_sf1       /tmp/campaign12/xconv_sf1.json  "x_pagerank_converged"

echo "=== phase C: merge + report ($(date +%H:%M:%S))"
python3 tools/merge_bench.py /tmp/campaign12/m_sf01.json /tmp/campaign12/b_sf01_a.json /tmp/campaign12/b_sf01_b.json
python3 tools/merge_bench.py /tmp/campaign12/m_sf1.json  /tmp/campaign12/b_sf1_a.json  /tmp/campaign12/b_sf1_b.json
python3 tools/merge_bench.py /tmp/campaign12/m_sf3.json  /tmp/campaign12/b_sf3_a.json  /tmp/campaign12/b_sf3_b.json
python3 tools/merge_bench.py /tmp/campaign12/m_sf10.json /tmp/campaign12/b_sf10_a.json /tmp/campaign12/b_sf10_b.json
python3 tools/scaling_report.py /tmp/campaign12/m_sf01.json /tmp/campaign12/m_sf1.json \
  /root/repo/SCALING.md /tmp/campaign12/m_sf3.json /tmp/campaign12/m_sf10.json
echo "=== r12 campaign done ($(date +%H:%M:%S))"
