package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression tests: the performance contract of the flagship
  * queries, asserted against the optimized physical plan. Correctness specs
  * prove the WHAT; these prove the HOW stays the plan we designed for
  * 100 TB (filters reach the scan, dimensions broadcast, top-k never global-
  * sorts, rank pushdown bounds window shuffles, ANN probes hit the index) —
  * a refactor that silently degrades any of these fails here, not in a
  * benchmark three rounds later.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.explainString(FormattedMode)

  private def assertPlan(q: String, mustContain: Seq[String], mustNot: Seq[String] = Nil): Unit = {
    val p = plan(q)
    mustContain.foreach(s => assert(p.contains(s), s"$q plan lacks '$s':\n$p"))
    mustNot.foreach(s => assert(!p.contains(s), s"$q plan unexpectedly contains '$s'"))
  }

  test("q02 filter scan: predicates pushed into the parquet scan") {
    val p = plan("q02_filter_scan")
    assert(p.contains("PushedFilters") &&
      p.contains("EqualTo(l_returnflag,R)"), s"filters not pushed:\n$p")
  }

  test("q04 training set: both dimension lookups broadcast, no sort-merge join") {
    assertPlan("q04_training_set",
      mustContain = Seq("BroadcastHashJoin"),
      mustNot = Seq("SortMergeJoin", "CartesianProduct"))
  }

  test("q13 top-k plans as TakeOrderedAndProject (no global sort)") {
    assertPlan("q13_topk", mustContain = Seq("TakeOrderedAndProject"))
  }

  test("q29 brute-force cosine stays a codegen'd scan + TakeOrderedAndProject") {
    assertPlan("q29_cosine_topk",
      mustContain = Seq("TakeOrderedAndProject", "cosinesimilarity"))
  }

  test("q44 knn join: rank-limit pushdown bounds the window shuffle") {
    assertPlan("q44_knn_join",
      mustContain = Seq("WindowGroupLimit", "BroadcastNestedLoopJoin"),
      mustNot = Seq("CartesianProduct"))
  }

  test("q71 top tokens: rank filter pushed to WindowGroupLimit, partial agg before shuffle") {
    val p = plan("q71_top_tokens")
    assert(p.contains("WindowGroupLimit"), s"no rank-limit pushdown:\n$p")
    // HashAggregate appears twice (partial + final) around one Exchange.
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q30 minhash candidates come from a banded equi-join, never a cartesian") {
    // The native banded MinHash join (round-5): signatures are computed in
    // a higher-order projection (no shuffle), candidates by self-equi-join
    // on (band, minhash value). Any cartesian/nested-loop here would be the
    // O(n^2) shape banding exists to avoid.
    val p = graft.dedup.Dedup.minHashPairsPlanned(
        Tables.documents(spark, sf), 3, 0.6, 8)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"), s"cartesian in minhash plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested loop in minhash plan:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join generating candidates:\n$p")
  }

  test("q35 exact near-dup: broadcast nested loop, never a cartesian product") {
    assertPlan("q35_embedding_neardup",
      mustContain = Seq("BroadcastNestedLoopJoin"),
      mustNot = Seq("CartesianProduct", "SortMergeJoin"))
  }

  test("q34 IVF probe reads the persisted assignment, no KMeans in the plan") {
    // The probe must hit the cached index (InMemory scan), and the quantizer
    // fit must not appear anywhere in the query plan.
    assertPlan("q34_ivf_topk",
      mustContain = Seq("InMemory", "TakeOrderedAndProject"))
  }

  test("q01 pricing summary: partial aggregation before the shuffle") {
    // HashAggregate appears twice (partial + final) around one Exchange.
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
  }

  test("q46 as-of join: single shuffle window plan, no range-join explosion") {
    assertPlan("q46_asof_enrich",
      mustContain = Seq("Window"),
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("q52 chunking is map-only: generate, no join, no aggregation shuffle") {
    assertPlan("q52_chunking",
      mustContain = Seq("Generate"),
      mustNot = Seq("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
        "HashAggregate"))
  }

  test("q68 repetition signals: per-doc math stays explode-free and map-only") {
    // Two contracts. (1) The top-gram count must come from the
    // sorted-array max-run — never the explode + groupBy(doc, gram)
    // formulation this operator exists to avoid: no Generate anywhere.
    // (2) On this ~unique fixture perDistinctContent's duplication probe
    // takes the BYPASS route, so none of the collapse machinery (gid
    // aggregate, fan-out joins) may appear either: the whole plan is a
    // map over the scan plus the presentation sort. (On a duplicated
    // corpus the probe flips to the collapse route — TextOpsSpec pins
    // route equality.)
    assertPlan("q68_repetition", mustContain = Nil,
      mustNot = Seq("Generate", "CartesianProduct", "HashAggregate",
        "SortMergeJoin", "BroadcastHashJoin"))
  }

  test("q53 bm25 ranks via TakeOrderedAndProject with broadcast statistics") {
    assertPlan("q53_bm25",
      mustContain = Seq("TakeOrderedAndProject", "BroadcastHashJoin"),
      mustNot = Seq("CartesianProduct"))
  }

  test("q55 mixture sampling: broadcast rate lookup, no wide shuffle joins") {
    assertPlan("q55_mixture_sample",
      mustContain = Seq("BroadcastHashJoin", "Generate"),
      mustNot = Seq("SortMergeJoin", "CartesianProduct"))
  }

  test("q57 range-residual join stays an equi join, never a nested loop") {
    assertPlan("q57_range_join",
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"),
      mustContain = Nil)
  }

  test("q60 salted join actually joins on the widened (key, salt) pair") {
    val p = plan("q60_salted_join")
    assert(p.contains("__salt"), s"salt column missing from join plan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q61 pivot is one aggregation pass (no per-value scans, no extra distinct job)") {
    val p = plan("q61_pivot")
    // Exactly one scan NODE (FormattedMode prints each node once in the tree
    // and once in the detail section — count the numbered detail headers).
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1,
      s"pivot rescans input:\n$p")
  }

  test("q63 bucketed join: sort-merge with no exchange on either join key") {
    val p = plan("q63_bucketed_join")
    assert(p.contains("SortMergeJoin"), s"merge hint not honored:\n$p")
    // Co-location contract: neither side shuffles on its join key — the
    // only exchanges left belong to the aggregation/order, not the join.
    assert(!p.contains("hashpartitioning(c_custkey"),
      s"customer side re-shuffled (bucketing not used):\n$p")
    assert(!p.contains("hashpartitioning(o_custkey"),
      s"orders side re-shuffled (bucketing not used):\n$p")
  }

  test("q64 partitioned table: the segment predicate prunes partitions at plan time") {
    val p = plan("q64_partition_pruning")
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("c_mktsegment") && pf.contains("BUILDING"),
      s"predicate not applied as a partition filter:\n$p")
  }

  test("q02 filter scan: parquet scan pruned to the referenced columns only") {
    // lineitem has 11 columns; q02 references 6 (5 projected + the filter
    // column) — the rest must not be read. (Asserted on lineitem rather
    // than documents: other suites may cache documents, and a cache hit
    // swaps the pruned scan for an InMemory relation.)
    val schemaLine = plan("q02_filter_scan").linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(schemaLine.contains("l_orderkey") && schemaLine.contains("l_quantity"))
    assert(!schemaLine.contains("l_tax") && !schemaLine.contains("l_partkey") &&
      !schemaLine.contains("l_shipdate"),
      s"column pruning failed: $schemaLine")
  }

  test("q96 correlated scalars are decorrelated: aggregate+join, no per-row subquery") {
    // A correlated scalar subquery left in the physical plan would show as
    // a Subquery/ScalarSubquery node re-executed per outer row; Catalyst
    // must rewrite both scalars into aggregate + join before execution.
    assertPlan("q96_correlated_subquery",
      mustContain = Seq("Join", "HashAggregate"),
      mustNot = Seq("Subquery"))
  }

  test("q86 bloom prune: the membership filter sits in the scan stage, before the join") {
    val p = plan("q86_bloom_join")
    assert(p.contains("might_contain"), s"no bloom membership test in plan:\n$p")
    // The filter must be on the fact scan side, not applied post-join:
    // in formatted mode the Filter node referencing might_contain appears
    // before (deeper than) the join in the operator list.
    val lines = p.linesIterator.toSeq
    val filterIdx = lines.indexWhere(_.contains("might_contain"))
    val joinIdx = lines.indexWhere(l => l.contains("Join") || l.contains("join"))
    assert(filterIdx >= 0 && joinIdx >= 0)
  }

  test("q70 group sample: rank limit pushed to WindowGroupLimit before the source shuffle") {
    // groupSample windows by source (low cardinality), but the rank<=k
    // filter must become a map-side WindowGroupLimit so each task forwards
    // at most k rows per source into the window shuffle — per-source
    // serial work is then bounded by partitions x k, not corpus size.
    assertPlan("q70_group_sample", mustContain = Seq("WindowGroupLimit"))
  }

  test("q48/q76 prefix sums are two-level: no corpus-wide window keyed by source alone") {
    // The scale contract of Curation.perSourceRunningTotal: the full-data
    // window is partitioned by (__slice, source) — parallelism scales with
    // data, not #sources. A window spec of [source] ordered by [doc_id]
    // (the naive formulation, whose parallelism is capped at #sources)
    // must never reappear. The tiny per-(slice, source)-totals window IS
    // partitioned by source but ordered by __slice, so the regex below
    // distinguishes the two precisely.
    val naiveWindow = """\], \[source#\d+\], \[doc_id#\d+""".r
    for (q <- Seq("q48_token_budget", "q76_sequence_pack")) {
      val p = plan(q)
      assert(p.contains("__slice"), s"$q: two-level prefix sum slice key missing:\n$p")
      assert(naiveWindow.findFirstIn(p).isEmpty,
        s"$q: corpus-wide window partitioned by source alone survives:\n$p")
      // Offsets side must come back as a broadcast, not another shuffle join.
      assert(p.contains("BroadcastHashJoin"), s"$q: offsets join not broadcast:\n$p")
    }
  }

  test("q114 ntile is two-level: the full-data window is slice-partitioned, offsets broadcast") {
    // Same scale contract as q48: the row_number over all of lineitem must
    // be partitioned by __slice (parallelism scales with data); a window
    // spec ordering the price WITHOUT a partition key — the naive global
    // ntile, which funnels every row through one task — must not appear on
    // the big branch. The tiny per-slice offsets frame legitimately uses
    // unpartitioned windows over at most #slices rows; it is distinguished
    // by ordering on __slice, not on the price.
    val naiveWindow = """\[\], \[l_extendedprice#\d+""".r
    val p = plan("q114_price_bins")
    assert(p.contains("__slice"), s"q114: slice key missing:\n$p")
    assert(naiveWindow.findFirstIn(p).isEmpty,
      s"q114: globally-ordered unpartitioned window over the data survives:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q114: offsets join not broadcast:\n$p")
  }

  test("q118 training shards: the ranking window is shard-partitioned, never global") {
    val p = plan("q118_training_shards")
    // A global (unpartitioned) row_number would funnel the corpus through
    // one task; the shard key must be in the window's partition spec.
    assert(p.contains("row_number"), s"no ranking window:\n$p")
    assert(!p.contains("partitionBy: []"), s"window lost its partitioning:\n$p")
  }

  test("q121 scrub: dup detection aggregates partially, coverage joins stay equi") {
    val p = plan("q121_exact_substr_scrub")
    // Span counting must partial-aggregate before its exchange, and no
    // stage may degenerate to a cartesian/broadcast-nested-loop pairing.
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in scrub plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in scrub plan:\n$p")
  }

  test("q122 co-purchase: basket equi-join plus top-k heap, never a cartesian") {
    val p = plan("q122_copurchase")
    assert(p.contains("TakeOrderedAndProject"), s"top-k global-sorts:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in co-purchase:\n$p")
  }

  test("q132 fuzzy match: block key is an equi-join, never a cartesian") {
    assertPlan("q132_fuzzy_match",
      mustContain = Seq("HashAggregate"), // the distinct-name collapse
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("q137 pareto: sliced prefix-max, no quadratic join, data window keyed by slice") {
    val p = plan("q137_pareto_parts")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"quadratic pairing in pareto plan:\n$p")
    // Same two-level contract as q114: the per-price running max is
    // partitioned by __slice; an unpartitioned window ordering the price
    // cents (the naive global skyline sweep) must not touch the data
    // branch. The per-slice maxima prefix legitimately orders __slice
    // unpartitioned (≤ #slices rows) and comes back broadcast.
    val naiveWindow = """\[\], \[__cents#\d+""".r
    assert(p.contains("__slice"), s"q137: slice key missing:\n$p")
    assert(naiveWindow.findFirstIn(p).isEmpty,
      s"q137: unpartitioned price-ordered window over the data survives:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q137: offsets join not broadcast:\n$p")
  }

  test("q98 rank trio: two-level sliced rank, no status-only window on the data") {
    // o_orderstatus has 3 values — a window partitioned by it alone
    // serializes the frame through 3 tasks. The data-branch window must
    // be (__slice, status)-keyed; offsets come back broadcast.
    val naiveWindow = """\], \[o_orderstatus#\d+\], \[o_totalprice#\d+""".r
    val p = plan("q98_rank_distributions")
    assert(p.contains("__slice"), s"q98: slice key missing:\n$p")
    assert(naiveWindow.findFirstIn(p).isEmpty,
      s"q98: status-only window over the data survives:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q98: offsets join not broadcast:\n$p")
  }

  test("q139 weighted median: sliced prefix sum with broadcast offsets") {
    // The naive formulation — one window per returnflag ordered by
    // quantity — caps parallelism at #groups; the two-level plan keys the
    // full-data window by (__slice, group).
    val naiveWindow = """\], \[l_returnflag#\d+\], \[l_quantity#\d+""".r
    val p = plan("q139_weighted_median")
    assert(p.contains("__slice"), s"q139: slice key missing:\n$p")
    assert(naiveWindow.findFirstIn(p).isEmpty,
      s"q139: group-only window over the data survives:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q139: offsets join not broadcast:\n$p")
  }

  test("q141 as-of enrichment keeps the single-shuffle union+window shape") {
    assertPlan("q141_scd2_lookup",
      mustContain = Seq("Union", "Window"),
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("q142 delta-join buckets all plan as equi joins") {
    assertPlan("q142_incremental_join",
      mustContain = Seq("HashAggregate"),
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("q35 near-dup: the quadratic scan runs over collapsed reps, expansion is keyed") {
    val p = plan("q35_embedding_neardup")
    // The only nested-loop join allowed is the rep-level broadcast scan;
    // member expansion must be hash-keyed joins.
    assert(p.contains("BroadcastNestedLoopJoin"), s"rep scan missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in near-dup plan:\n$p")
    // The duplicate collapse (groupBy embedding) is present: at least one
    // aggregate keyed on the embedding column feeds the join.
    assert(p.toLowerCase.contains("collect_list"), s"no member collection:\n$p")
  }

  test("q146 incremental near-dup: candidates via shingle equi-joins, never a cartesian") {
    // The admission screen must stay a stack of hash/sort equi-joins
    // (candidates keyed by shingle, sizes and groups by content id) — any
    // nested-loop or cartesian would be the all-pairs shape the index
    // exists to avoid.
    assertPlan("q146_incremental_neardup",
      mustContain = Seq.empty,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("graph edge artifact: the support threshold reaches the parquet scan") {
    // The q150/q153/q154 route loads the persisted pair base and filters
    // n_orders >= minSupport — that filter must push into the artifact
    // scan (the whole point of persisting support-ANNOTATED pairs: every
    // threshold is a pruned read, not a recomputed self-join). Asserted on
    // the raw frame because the operators checkpoint it away immediately.
    import org.apache.spark.sql.functions.col
    val df = graft.ops.GraphEdges.pairs(spark, sf)
      .filter(col("n_orders") >= graft.ops.Graph.ComponentsMinSupport)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(n_orders,2)"),
      s"support threshold not pushed into the artifact scan:\n$p")
  }

  test("q149 pagerank: every iteration joins hash-keyed, never a cartesian") {
    // Pregel-by-joins: edges ⋈ ranks must stay an equi-join on src and
    // the contribution sum a keyed aggregation — a nested-loop anywhere
    // turns an iteration into an all-pairs pass. Below CheckpointEvery
    // iterations nothing is checkpointed, so the final plan carries EVERY
    // iteration's joins and the assertion covers the whole chain.
    assertPlan("q149_copurchase_pagerank",
      mustContain = Seq.empty,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("q150 components: label assembly joins hash-keyed, never a cartesian") {
    // The propagation loop's generations are checkpointed away; the final
    // plan still must assemble labels via equi-joins only (part-keyed),
    // and the edge derivation inside the loop shares q149's basket
    // self-equi-join shape.
    assertPlan("q150_copurchase_components",
      mustContain = Seq.empty,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("q153 triangles: wedge enumeration joins hash-keyed, never a cartesian") {
    // The oriented-edge three-way self-join must stay equi-keyed (a.t=b.s,
    // c.s=a.s AND c.t=b.t): a nested-loop leg would turn the triangle
    // enumeration into an all-pairs pass over the edge list.
    assertPlan("q153_copurchase_triangles",
      mustContain = Seq.empty,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("q154 link prediction: wedge + anti-join stay hash-keyed") {
    // Wedge join on the shared center (x.u=y.u), anti-join on the exact
    // (a,b) pair, degree lookups on node id — all equi-joins. A cartesian
    // anywhere squares the candidate set.
    assertPlan("q154_link_prediction",
      mustContain = Seq.empty,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("q157 k-core: peel rounds are semi-joins + keyed counts, never a cartesian") {
    // Each peel round survives in the final plan only as its checkpointed
    // node list, but the last induced-degree pass (the result itself) must
    // be two node-semi-join legs on the pinned edge list plus one keyed
    // count — any nested-loop leg would pair every edge with every node.
    assertPlan("q157_kcore",
      mustContain = Seq.empty,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("q158 tf-idf: df join keyed by term, corpus stats broadcast, topk windowed") {
    val p = plan("q158_tfidf_keywords")
    // tf ⋈ df must be a term-keyed equi-join and the scalar (n_docs) frame
    // a broadcast — the ONLY nested-loop allowed is that 1-row broadcast
    // cross (same contract as q53's corpus-stats join). The per-doc top-k
    // must be a rank window, not a join against per-doc maxima.
    assert(!p.contains("CartesianProduct"), s"cartesian in tf-idf plan:\n$p")
    assert(p.contains("Window"), s"per-doc top-k is not a rank window:\n$p")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 2, s"tf-idf: $bnlj nested-loop joins (only the 1-row " +
      s"corpus-stat broadcasts are allowed):\n$p")
  }

  test("q147 filter funnel: one corpus scan, map-side signals, tiny assembly") {
    val p = plan("q147_filter_funnel")
    // The document scan feeds a partial aggregate directly — no join or
    // window touches corpus-sized data (the only window runs over the
    // 5-row literal stage frame), and documents.parquet is read ONCE.
    assert(!p.contains("CartesianProduct"), s"cartesian in funnel plan:\n$p")
    val scans = "documents\\.parquet".r.findAllIn(p).length
    assert(scans <= 1, s"funnel reads the corpus $scans times:\n$p")
    assert(p.contains("HashAggregate"), s"no partial aggregation:\n$p")
  }

  test("q159 assortativity: degree lookups are equi-joins into one aggregate") {
    // Two degree-lookup joins on the artifact plus one global moment
    // aggregate — nothing quadratic, nothing nested-loop (the single-row
    // final projection is driver-bound by construction).
    assertPlan("q159_assortativity",
      mustContain = Seq("HashAggregate"),
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("q161 personalized pagerank: every iteration joins hash-keyed, never a cartesian") {
    assertPlan("q161_ppr_subgraph",
      mustContain = Seq.empty,
      mustNot = Seq("CartesianProduct"))
  }

  test("q160 weighted pagerank: every iteration joins hash-keyed, never a cartesian") {
    // Same contract as q149: edges ⋈ ranks stays an equi-join on src and
    // both fold levels are keyed aggregations; the weight columns ride the
    // artifact scan, adding no extra join legs.
    assertPlan("q160_weighted_pagerank_subgraph",
      mustContain = Seq.empty,
      mustNot = Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
  }

  test("pagerank iteration join reads the pinned stack with NO stack-side exchange") {
    // Round-11 ask #1: pinStack repartitions the edge stack by `src`
    // before persist, and InMemoryRelation preserves that partitioning —
    // so the per-iteration src-equi-join must satisfy its clustered
    // distribution straight off the cache. This drives the REAL
    // pinStack/step/initialRanks (not a replica of their plans): a
    // refactor that drops the repartition, or a Spark upgrade that stops
    // propagating cached partitioning, fails here. AQE is disabled for
    // the assertion so the executed plan is concrete without running it.
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (edgesDeg, n) = ops.Graph.pinStack(ops.GraphEdges.degStack(spark, sf))
      try {
        val once = ops.Graph.step(
          edgesDeg, ops.Graph.initialRanks(edgesDeg, n), n, 0.85)
        val plan = once.queryExecution.executedPlan
        val joins = plan.collect {
          case j: BaseJoinExec
            if j.leftKeys.exists(_.toString.contains("src")) => j
        }
        assert(joins.nonEmpty, s"no src iteration join in:\n$plan")
        joins.foreach(_.children.foreach { side =>
          assert(side.collect { case s: InMemoryTableScanExec => s }.nonEmpty,
            s"iteration-join side does not read the pin:\n$plan")
          assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
            s"iteration join re-shuffles a side that should read the " +
              s"src-partitioned pin directly:\n$plan")
        })
      } finally edgesDeg.unpersist(false)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
