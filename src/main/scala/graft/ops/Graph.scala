package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative link analysis over relational co-occurrence graphs — the
  * Pregel-by-joins family (reference scope: none; build-target extension).
  *
  * PageRank here runs over the part co-purchase graph ([[Relational
  * .coPurchasePairs]]' edge definition, symmetrized, unweighted): nodes
  * are parts that share at least one order with another part, so the
  * graph has no dangling nodes (symmetry gives every node out-degree
  * ≥ 1) and the classic dangling-mass correction drops out.
  *
  * Scale shape: the edge list and per-node degrees are built once and
  * pinned via the DataFrame cache at MEMORY_AND_DISK — COMPRESSED
  * COLUMNAR batches (three long columns), spilling past the storage
  * pool, and unpersisted before the operator returns. This replaced the
  * round-7 localCheckpoint pin, which held the same sf10 ~240M-row
  * frame as DESERIALIZED row objects on the heap — the measured
  * 5.8×-per-decade memory wall. Each iteration is then one hash
  * equi-join
  * (edges ⋈ ranks on src) and two keyed aggregations — the standard
  * distributed PageRank step. Rank lineage is truncated only every
  * [[CheckpointEvery]] iterations (plan depth stays bounded without
  * paying a materialization per round); between checkpoints the
  * iterations fuse into one job whose shuffle stages each run once.
  *
  * Cross-engine exactness: per-node contribution sums fold in a
  * DETERMINISTIC two-level order — neighbors are bucketed into
  * [[FoldSlices]] slices by `src % FoldSlices`, each slice folds
  * left-to-right over neighbors sorted by source id, then slice sums
  * fold left-to-right by slice id — and the oracle SQL performs the
  * IDENTICAL two-level fold (`list_reduce(list(… ORDER BY …))` at both
  * levels), so ranks match bit-for-bit and the top-k cut (on the
  * ROUNDED rank, ties to min part id) cannot straddle an epsilon.
  * The slicing also bounds aggregation buffers: a hot node's neighbor
  * array never materializes whole — per-group arrays hold at most
  * max(FoldSlices, degree/FoldSlices) entries, so a power-law hub is a
  * set of medium groups instead of one straggler/OOM row (the
  * [[Partitioning.slicedRunningMax]] discipline applied to folds).
  */
object Graph {

  /** Damping, iteration count, and output size for q149 — the oracle SQL
    * is GENERATED from these same constants ([[pageRankSql]]), so the two
    * sides cannot drift. */
  val PageRankDamping = 0.85
  val PageRankIterations = 3
  val PageRankTopK = 20

  /** Per-node fold slice count: contribution sums fold within
    * `src % FoldSlices` buckets first, then across buckets. Mirrored
    * literally in the oracle SQL — changing it changes BOTH sides. */
  val FoldSlices = 64

  /** Rank lineage is localCheckpoint'ed every this-many iterations: deep
    * enough that a 3-iteration run never materializes intermediates, while
    * a convergence run's plan depth stays bounded. */
  val CheckpointEvery = 4

  /** Storage level for the edge+degree pin. Overridable via the
    * SPARK_GRAFT_GRAPH_PIN env (any [[StorageLevel.fromString]] name) so a
    * deployment whose edge frame dwarfs executor storage can move it to
    * DISK_ONLY without a rebuild. The default was settled by a 2x2
    * fresh-JVM A/B at the LARGEST bench scale (sf10, ~240M edge rows,
    * round 9): with the pin released on return (below), MEMORY_AND_DISK
    * best 152.6 s vs DISK_ONLY best 149.7 s — a tie inside the run-to-run
    * spread (150-187 s across all samples) — while at sf3 the columnar
    * cache had measured ~1.6x faster (37 s vs 61 s, round 8). Columnar
    * MEMORY_AND_DISK therefore stays: it wins the mid scale and costs
    * nothing at the top one. (The round-8 237 s sf10 wall under this same
    * level was the LEAKED pin competing with shuffle memory, not the
    * level itself.) */
  private[graft] val EdgePin: StorageLevel =
    sys.env.get("SPARK_GRAFT_GRAPH_PIN").map(StorageLevel.fromString)
      .getOrElse(StorageLevel.MEMORY_AND_DISK)

  /** The pinned edge+degree frame and node count shared by both PageRank
    * modes: one distinct-basket self-join, symmetrized, degree-annotated,
    * cached (columnar, [[EdgePin]]) and materialized exactly once.
    * Callers MUST unpersist the returned frame before returning — a
    * forgotten pin is a session-lifetime CacheManager entry (~GBs at
    * sf10) that repeated calls stack up. */
  private def edgeStack(lineitem: DataFrame): (DataFrame, Long) = {
    val baskets = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    val edges = pairs
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // Edge+degree stack reused every iteration: pin it once via the
    // DataFrame cache — COMPRESSED COLUMNAR batches (three long columns
    // compress to a few bytes/row), spilling to disk only past the
    // storage pool. This is what the round-7 localCheckpoint pin was not:
    // localCheckpoint persists the raw RDD[InternalRow] DESERIALIZED
    // (row objects on heap — the measured 5.8×-per-decade sf10 memory
    // wall); the columnar pin holds the same sf10 frame in ~GBs.
    val edgesDeg = edges.join(deg, Seq("src"))
      .persist(EdgePin)
    // Bounded driver scalar (one long) whose computation doubles as the
    // action that materializes the pin.
    val n = edgesDeg.select(countDistinct(col("src"))).first().getLong(0)
    (edgesDeg, n)
  }

  /** One PageRank iteration: contributions via ONE hash equi-join, then
    * the two-level sliced fold (see the object doc). Both aggregation
    * levels are keyed — no global or per-node unbounded buffer. */
  private def step(edgesDeg: DataFrame, ranks: DataFrame, n: Long,
      damping: Double): DataFrame = {
    val contribs = edgesDeg
      .join(ranks.withColumnRenamed("part", "src"), Seq("src"))
      .select(col("dst"), col("src"), (col("rank") / col("outdeg")).as("c"))
    val sliceSums = contribs
      .groupBy(col("dst"), pmod(col("src"), lit(FoldSlices.toLong)).as("__sl"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("src"), col("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")).as("__ss"))
    sliceSums.groupBy(col("dst"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("__sl"), col("__ss")))),
        lit(0.0), (acc, x) => acc + x.getField("__ss")).as("__s"))
      .select(col("dst").as("part"),
        (lit(1.0 - damping) / lit(n.toDouble) +
          lit(damping) * col("__s")).as("rank"))
  }

  private def initialRanks(edgesDeg: DataFrame, n: Long): DataFrame =
    edgesDeg.select(col("src").as("part")).distinct()
      .select(col("part"), lit(1.0 / n).as("rank"))

  /** Top-k parts by PageRank over the symmetrized co-purchase graph. */
  def coPurchasePageRank(lineitem: DataFrame,
      iterations: Int = PageRankIterations,
      damping: Double = PageRankDamping,
      k: Int = PageRankTopK): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
    val (edgesDeg, n) = edgeStack(lineitem)
    try {
      var ranks = initialRanks(edgesDeg, n)
      var sinceCheckpoint = 0
      for (i <- 1 to iterations) {
        ranks = step(edgesDeg, ranks, n, damping)
        sinceCheckpoint += 1
        // Truncate lineage only at the cadence (and never after the final
        // iteration — the eager finalize below finishes the chain): bounded
        // plan depth without a forced materialization per round.
        if (sinceCheckpoint >= CheckpointEvery && i < iterations) {
          ranks = ranks.localCheckpoint(true)
          sinceCheckpoint = 0
        }
      }
      // Eagerly materialize the k-row answer so the edge pin can be
      // released HERE: returning a lazy plan over a persisted frame would
      // either leak the pin for the session (the round-8 defect — each
      // call stacked a permanent CacheManager entry) or force callers to
      // know about it. A ≤k-row localCheckpoint is driver-cheap.
      ranks
        .select(col("part"), round(col("rank"), 6).as("rank"))
        .orderBy(col("rank").desc, col("part"))
        .limit(k)
        .localCheckpoint(true)
    } finally edgesDeg.unpersist(false)
  }

  /** PageRank run to CONVERGENCE: iterate until `max |Δrank| < eps` or
    * `maxIterations`, whichever first — the shape a real centrality run
    * uses (fixed-iteration is the demo/oracle shape). Per iteration this
    * pays one eager checkpoint (the rank frame is read twice: once for
    * the delta, once by the next step), still constant plan depth.
    * Refuses to return unconverged ranks — partial centrality silently
    * misranks, exactly like unconverged components would. */
  def coPurchasePageRankConverged(lineitem: DataFrame,
      eps: Double = 1e-6,
      maxIterations: Int = 50,
      damping: Double = PageRankDamping): DataFrame = {
    require(eps > 0, s"need eps > 0, got $eps")
    val (edgesDeg, n) = edgeStack(lineitem)
    var ranks = initialRanks(edgesDeg, n).localCheckpoint(true)
    var delta = Double.MaxValue
    var iter = 0
    // Convergence detection is IN-ROUND here (each round's own delta is
    // what's tested), so unlike connectedComponents there is no extra
    // detection round to budget for: a run whose delta first drops below
    // eps at round maxIterations passes. The edge pin is released in the
    // finally — every iteration's checkpoint is eager, so by loop exit the
    // rank frame no longer reads through it.
    try {
      while (delta >= eps && iter < maxIterations) {
        val next = step(edgesDeg, ranks, n, damping).localCheckpoint(true)
        // All nodes persist across iterations (symmetry ⇒ every node has an
        // incoming edge), so the inner join is total.
        delta = next
          .join(ranks.withColumnRenamed("rank", "__prev"), Seq("part"))
          .select(max(abs(col("rank") - col("__prev"))).as("d"))
          .first().getDouble(0)
        ranks = next
        iter += 1
      }
    } finally edgesDeg.unpersist(false)
    require(delta < eps,
      s"pagerank: not converged after $maxIterations rounds (max delta $delta >= $eps) " +
        "— raise maxIterations; unconverged ranks would silently misrank.")
    ranks.orderBy(col("rank").desc, col("part"))
  }

  /** Connected components by iterative hash-to-min propagation with
    * pointer jumping — the first-class face of the component pass inside
    * [[graft.dedup.Dedup.clusterPairs]], for arbitrary (src, dst) edge
    * frames. Returns (node, component) for every node incident to an
    * edge; component = the smallest node id in the component.
    *
    * Scale shape: the symmetrized edge list is pinned once; each round is
    * one equi-join + keyed min (adopt the smallest neighbor label) and one
    * label-keyed self-join (pointer jumping — each label is replaced by
    * its label's label, cutting round count from O(diameter) to
    * O(log diameter)); every generation is localCheckpoint'ed so plan
    * depth is constant ([[coPurchasePageRank]]'s discipline). REFUSES to
    * return unconverged labels — a partial propagation is wrong clusters,
    * not an approximation. */
  def connectedComponents(edgesIn: DataFrame, maxIter: Int = 50): DataFrame = {
    val cols = edgesIn.columns
    require(cols.length == 2, s"connectedComponents wants (src, dst), got ${cols.mkString(",")}")
    val directed = edgesIn.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
    val edges = directed
      .union(directed.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    // `maxIter` bounds PROPAGATION rounds; convergence is only observable
    // one round later (a full no-change round), so the loop allows exactly
    // one detection round beyond the cap — a graph whose labels settle at
    // round maxIter must not throw away correct labels (the extra round
    // costs nothing on already-converged labels: nothing changes, the
    // loop exits).
    try {
      while (!converged && iter < maxIter + 1) {
        val neighborMin = edges
          .join(labels.withColumnRenamed("node", "dst")
            .withColumnRenamed("component", "__nbr"), Seq("dst"))
          .groupBy(col("src").as("node"))
          .agg(min(col("__nbr")).as("__nbr_min"))
        val propagated = labels
          .join(neighborMin, Seq("node"))
          .select(col("node"),
            least(col("component"), col("__nbr_min")).as("component"),
            col("component").as("__old"))
        // Pointer jumping: labels are node ids, so the label-as-node join
        // always resolves; labels are monotone non-increasing.
        val parents = propagated.select(
          col("node").as("__p_id"), col("component").as("__p_label"))
        val next = propagated
          .join(parents, col("component") === col("__p_id"), "left")
          .select(col("node"),
            coalesce(col("__p_label"), col("component")).as("component"),
            (coalesce(col("__p_label"), col("component")) < col("__old")).as("__changed"))
          .localCheckpoint()
        converged = next.filter(col("__changed")).limit(1).count() == 0
        labels = next.drop("__changed")
        iter += 1
      }
    } finally edges.unpersist()
    require(converged,
      s"connectedComponents: not converged after $maxIter propagation rounds " +
        "(+1 detection round) — raise maxIter (partial labels would be WRONG " +
        "components). The loop exits on the first no-change round, so a " +
        "generous cap costs nothing.")
    labels
  }

  /** Support threshold and convergence cap for q150 — like the PageRank
    * constants, [[coPurchaseComponentsSql]] is generated from these. */
  val ComponentsMinSupport = 2
  val ComponentsMaxIter = 50

  /** q150: connected components of the SUPPORT-THRESHOLDED co-purchase
    * graph — parts are linked when they co-occur in at least `minSupport`
    * distinct orders (the thresholding that turns the near-complete raw
    * co-purchase graph into the sparse affinity graph a basket analysis
    * actually clusters). Every part appearing in lineitem gets a row;
    * parts with no qualifying edge are their own singleton component. */
  def coPurchaseComponents(lineitem: DataFrame,
      minSupport: Int = ComponentsMinSupport,
      maxIter: Int = ComponentsMaxIter): DataFrame = {
    require(minSupport >= 1, s"need minSupport >= 1, got $minSupport")
    val baskets = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minSupport)
      .select(col("src"), col("dst"))
    val labels = connectedComponents(pairs, maxIter)
      .withColumnRenamed("node", "part")
    baskets.select(col("l_partkey").as("part")).distinct()
      .join(labels, Seq("part"), "left")
      .select(col("part"),
        coalesce(col("component"), col("part")).as("component"))
      .withColumn("is_representative", col("component") === col("part"))
      .orderBy("part")
  }

  /** The support-thresholded co-purchase edge list (src < dst): parts
    * linked when they co-occur in at least `minSupport` distinct orders —
    * the same sparse affinity graph [[coPurchaseComponents]] clusters,
    * shared by the local-structure operators below. */
  private def thresholdedPairs(lineitem: DataFrame, minSupport: Int): DataFrame = {
    val baskets = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    baskets.as("a")
      .join(baskets.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minSupport)
      .select(col("src"), col("dst"))
  }

  /** q153: per-node triangle participation over the support-thresholded
    * co-purchase graph. Edges are oriented LOW-DEGREE -> HIGH-DEGREE
    * (ties by id) before the wedge join — degree-ordered triangle
    * enumeration: every triangle is produced exactly once and the wedge
    * intermediate is O(m^1.5) regardless of hub skew, where an
    * id-oriented wedge join degrades to O(max_deg^2) on a power-law hub.
    * The oriented edge list is localCheckpoint'ed once and consumed by
    * all three join legs (blocks reclaimed by the ContextCleaner when
    * the frame drops out of scope). Integer-exact; [[trianglesSql]]
    * mirrors the identical orientation in DuckDB. */
  def coPurchaseTriangles(lineitem: DataFrame, k: Int = PageRankTopK,
      minSupport: Int = ComponentsMinSupport): DataFrame = {
    val p = thresholdedPairs(lineitem, minSupport)
    val und = p.select(col("src").as("u"), col("dst").as("v"))
      .union(p.select(col("dst").as("u"), col("src").as("v")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val e = und
      .join(deg.select(col("u").as("__au"), col("d").as("__da")),
        col("u") === col("__au"))
      .join(deg.select(col("u").as("__bu"), col("d").as("__db")),
        col("v") === col("__bu"))
      .filter(col("__da") < col("__db") ||
        (col("__da") === col("__db") && col("u") < col("v")))
      .select(col("u").as("s"), col("v").as("t"))
      .localCheckpoint(true)
    val tri = e.as("a")
      .join(e.as("b"), col("a.t") === col("b.s"))
      .join(e.as("c"), col("c.s") === col("a.s") && col("c.t") === col("b.t"))
      .select(col("a.s").as("x"), col("a.t").as("y"), col("b.t").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("triangles"))
      .orderBy(col("triangles").desc, col("part"))
      .limit(k)
  }

  /** q154: common-neighbor link prediction (Jaccard over neighbor sets)
    * on the thresholded co-purchase graph: for every NON-adjacent pair
    * with at least one shared neighbor, score |N(a)∩N(b)| / |N(a)∪N(b)|,
    * top-k with ties cut by (a, b) id order so the k-row answer is
    * unique. Wedge enumeration is inherently Σdeg²-shaped; the support
    * threshold is what keeps that sum bounded (the RAW co-purchase graph
    * would square a hub's fan-out — 240M edges at sf10 — which is why
    * the operator refuses to run unthresholded). Scores are integer
    * ratios evaluated in IEEE double and rounded to 6 digits on both
    * engines, so the comparison is exact. */
  def coPurchaseLinkPrediction(lineitem: DataFrame, k: Int = PageRankTopK,
      minSupport: Int = ComponentsMinSupport): DataFrame = {
    require(minSupport >= 2,
      s"linkPrediction needs the support threshold (got $minSupport): the " +
        "raw co-purchase graph's wedge join squares hub fan-outs")
    val p = thresholdedPairs(lineitem, minSupport).localCheckpoint(true)
    val und = p.select(col("src").as("u"), col("dst").as("v"))
      .union(p.select(col("dst").as("u"), col("src").as("v")))
    val w = und.as("x")
      .join(und.as("y"), col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .groupBy(col("x.v").as("a"), col("y.v").as("b"))
      .agg(count(lit(1)).as("common"))
    val cand = w.join(p,
      w("a") === p("src") && w("b") === p("dst"), "left_anti")
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
    cand
      .join(deg.select(col("u").as("a"), col("d").as("__da")), Seq("a"))
      .join(deg.select(col("u").as("b"), col("d").as("__db")), Seq("b"))
      .select(col("a"), col("b"),
        round(col("common").cast("double") /
          (col("__da") + col("__db") - col("common")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("a"), col("b"))
      .limit(k)
  }

  /** q153 oracle: the identical degree-ordered enumeration in DuckDB. */
  def trianglesSql(k: Int = PageRankTopK,
      minSupport: Int = ComponentsMinSupport): String =
    s"""WITH b AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |p AS MATERIALIZED (
       |  SELECT a.l_partkey AS src, b2.l_partkey AS dst
       |  FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
       |    AND a.l_partkey < b2.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $minSupport),
       |und AS (SELECT src AS u, dst AS v FROM p UNION ALL SELECT dst, src FROM p),
       |dg AS MATERIALIZED (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
       |e AS MATERIALIZED (
       |  SELECT un.u AS s, un.v AS t FROM und un
       |  JOIN dg da ON un.u = da.u JOIN dg db ON un.v = db.u
       |  WHERE da.d < db.d OR (da.d = db.d AND un.u < un.v)),
       |tri AS (SELECT a.s AS x, a.t AS y, b.t AS z
       |  FROM e a JOIN e b ON a.t = b.s
       |  JOIN e c ON c.s = a.s AND c.t = b.t),
       |pn AS (SELECT x AS part FROM tri UNION ALL SELECT y FROM tri
       |       UNION ALL SELECT z FROM tri)
       |SELECT part, COUNT(*) AS triangles FROM pn GROUP BY part
       |ORDER BY triangles DESC, part LIMIT $k""".stripMargin

  /** q154 oracle: the identical wedge count + Jaccard in DuckDB. */
  def linkPredictionSql(k: Int = PageRankTopK,
      minSupport: Int = ComponentsMinSupport): String =
    s"""WITH b AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |p AS MATERIALIZED (
       |  SELECT a.l_partkey AS src, b2.l_partkey AS dst
       |  FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
       |    AND a.l_partkey < b2.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $minSupport),
       |und AS MATERIALIZED (
       |  SELECT src AS u, dst AS v FROM p UNION ALL SELECT dst, src FROM p),
       |dg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
       |w AS (SELECT x.v AS a, y.v AS b, COUNT(*) AS common
       |      FROM und x JOIN und y ON x.u = y.u AND x.v < y.v
       |      GROUP BY 1, 2),
       |cand AS (SELECT w.a, w.b, w.common FROM w
       |         LEFT JOIN p ON w.a = p.src AND w.b = p.dst
       |         WHERE p.src IS NULL)
       |SELECT cand.a, cand.b,
       |  round(CAST(common AS DOUBLE) / (da.d + db.d - common), 6) AS jaccard
       |FROM cand JOIN dg da ON cand.a = da.u JOIN dg db ON cand.b = db.u
       |ORDER BY jaccard DESC, cand.a, cand.b LIMIT $k""".stripMargin

  /** Deterministic part-id restriction for the SUBGRAPH-oracle variants
    * (q151/q152): `l_partkey % SubgraphModulus == 0`. The scale corpora
    * offset part keys by multiples of 10M per copy (10M % 50 == 0), so the
    * predicate classifies every copy identically and the restricted graph
    * at sfN is N/0.1 disjoint copies of the sf0.1 subgraph — small enough
    * (~45k edges at sf10) that the full recursive-closure / unrolled-fold
    * oracle SQL runs in DuckDB at EVERY scale, closing the sf10
    * unchecked-oracle gap the full graph's oracle hits (it exhausts the
    * oracle box's RAM above sf3 — an oracle-infrastructure limit, not an
    * engine one). The engine side runs the IDENTICAL operators on the
    * filtered lineitem, so the subgraph queries exercise the same code
    * path q149/q150 bench on the full graph. */
  val SubgraphModulus = 50

  /** SQL predicate string mirrored on both engine and oracle sides of the
    * subgraph variants; empty string = unrestricted. */
  def subgraphWhere: String = s"WHERE l_partkey % $SubgraphModulus = 0"

  /** The q150 DuckDB oracle: the same thresholded edge set, components via
    * a recursive-CTE transitive closure (q69's oracle pattern), LEFT JOIN
    * back onto all parts. MATERIALIZED CTEs keep DuckDB from re-evaluating
    * the basket self-join per closure step. `where` (a raw SQL predicate,
    * e.g. [[subgraphWhere]]) restricts BOTH lineitem references — the edge
    * base AND the all-parts node set — for the q152 subgraph variant. */
  def coPurchaseComponentsSql(minSupport: Int = ComponentsMinSupport,
      where: String = ""): String =
    s"""WITH RECURSIVE b AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem $where),
       |p AS MATERIALIZED (
       |  SELECT a.l_partkey AS src, b2.l_partkey AS dst
       |  FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
       |    AND a.l_partkey < b2.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $minSupport),
       |undirected AS MATERIALIZED (
       |  SELECT src AS u, dst AS v FROM p UNION SELECT dst, src FROM p),
       |closure(u, v) AS (
       |  SELECT u, v FROM undirected
       |  UNION
       |  SELECT c.u, d.v FROM closure c JOIN undirected d ON c.v = d.u),
       |comp AS (SELECT u AS part, LEAST(u, MIN(v)) AS component
       |         FROM closure GROUP BY u),
       |nodes AS (SELECT DISTINCT l_partkey AS part FROM lineitem $where)
       |SELECT n.part, coalesce(comp.component, n.part) AS component,
       |  coalesce(comp.component, n.part) = n.part AS is_representative
       |FROM nodes n LEFT JOIN comp USING (part)
       |ORDER BY n.part""".stripMargin

  /** The q149 DuckDB oracle, unrolled to [[PageRankIterations]] stages
    * from the SAME constants the engine runs with. Every float step
    * mirrors the engine: CAST-to-DOUBLE literals (DuckDB decimals would
    * otherwise change the arithmetic), the two-level sliced fold
    * (per-slice `list_reduce(list(c ORDER BY src))` inside
    * `src % FoldSlices` buckets, then `list_reduce(list(ss ORDER BY sl))`
    * across buckets — the IDENTICAL reassociation the engine performs),
    * and the cut on the rounded rank. The multiply-referenced CTEs are
    * MATERIALIZED: the naive inlined form re-evaluates the basket
    * self-join once per closure/iteration reference, which overflowed
    * DuckDB's spill disk above sf1 (the round-7 unchecked-oracle gap). */
  def pageRankSql(iterations: Int = PageRankIterations,
      damping: Double = PageRankDamping,
      k: Int = PageRankTopK,
      where: String = ""): String = {
    val d = s"CAST($damping AS DOUBLE)"
    val head =
      s"""WITH b AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem $where),
         |p AS MATERIALIZED (
         |  SELECT a.l_partkey AS src, b2.l_partkey AS dst
         |  FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
         |    AND a.l_partkey < b2.l_partkey
         |  GROUP BY 1, 2),
         |e AS MATERIALIZED (
         |  SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
         |dg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
         |nn AS (SELECT COUNT(*) AS n FROM dg),
         |r0 AS (SELECT dg.src AS part, CAST(1 AS DOUBLE) / nn.n AS rank
         |       FROM dg CROSS JOIN nn)""".stripMargin
    val iters = (1 to iterations).map { i =>
      s""",
         |c$i AS (
         |  SELECT e.dst, e.src, e.src % $FoldSlices AS sl,
         |    r.rank / dg.outdeg AS c
         |  FROM e JOIN r${i - 1} r ON e.src = r.part JOIN dg ON e.src = dg.src),
         |s$i AS (
         |  SELECT dst, sl, list_reduce(list(c ORDER BY src), (a, b) -> a + b) AS ss
         |  FROM c$i GROUP BY dst, sl),
         |r$i AS (
         |  SELECT s$i.dst AS part,
         |    (CAST(1 AS DOUBLE) - $d) / nn.n
         |      + $d * list_reduce(list(ss ORDER BY sl), (a, b) -> a + b) AS rank
         |  FROM s$i CROSS JOIN nn GROUP BY s$i.dst, nn.n)""".stripMargin
    }.mkString
    head + iters +
      s"""
         |SELECT part, round(rank, 6) AS rank FROM r$iterations
         |ORDER BY rank DESC, part LIMIT $k""".stripMargin
  }
}
