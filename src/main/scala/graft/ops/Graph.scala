package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * pinned (`localCheckpoint`), then each iteration is exactly one hash
  * equi-join (edges ⋈ ranks on src) and one groupBy(dst) shuffle — the
  * standard distributed PageRank step. Checkpointing each iteration's
  * ranks keeps the plan depth CONSTANT across iterations (no lineage
  * blow-up), which is what lets the same loop run 30 iterations at
  * 100 TB without re-planning cost growing per round.
  *
  * Cross-engine exactness: per-node contribution sums fold left-to-right
  * over neighbors sorted by source id (`aggregate(array_sort(
  * collect_list(...)))` ⇔ DuckDB `list_reduce(list(c ORDER BY src))`),
  * and the damping update is the same literal IEEE expression on both
  * sides — so ranks match bit-for-bit and the top-k cut (on the ROUNDED
  * rank, ties to min part id) cannot straddle an epsilon.
  */
object Graph {

  /** Damping, iteration count, and output size for q149 — the oracle SQL
    * is GENERATED from these same constants ([[pageRankSql]]), so the two
    * sides cannot drift. */
  val PageRankDamping = 0.85
  val PageRankIterations = 3
  val PageRankTopK = 20

  /** Top-k parts by PageRank over the symmetrized co-purchase graph. */
  def coPurchasePageRank(lineitem: DataFrame,
      iterations: Int = PageRankIterations,
      damping: Double = PageRankDamping,
      k: Int = PageRankTopK): DataFrame = {
    require(iterations >= 1, s"need iterations >= 1, got $iterations")
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
    // Edge+degree stack reused every iteration: pin it once. The degree
    // join rides inside the pin, so an iteration pays ONE join + ONE
    // aggregation, nothing else.
    val edgesDeg = edges.join(deg, Seq("src")).localCheckpoint(true)
    val n = deg.count() // bounded driver scalar: one long, like ngramJaccardGraph's total
    var ranks = deg.select(col("src").as("part"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("part", "src"), Seq("src"))
        .select(col("dst"), col("src"), (col("rank") / col("outdeg")).as("c"))
      ranks = contribs.groupBy(col("dst"))
        .agg(aggregate(
          array_sort(collect_list(struct(col("src"), col("c")))),
          lit(0.0), (acc, x) => acc + x.getField("c")).as("__s"))
        .select(col("dst").as("part"),
          (lit(1.0 - damping) / lit(n.toDouble) +
            lit(damping) * col("__s")).as("rank"))
        .localCheckpoint(true) // constant plan depth across iterations
    }
    ranks
      .select(col("part"), round(col("rank"), 6).as("rank"))
      .orderBy(col("rank").desc, col("part"))
      .limit(k)
  }

  /** The q149 DuckDB oracle, unrolled to [[PageRankIterations]] stages
    * from the SAME constants the engine runs with. Every float step
    * mirrors the engine: CAST-to-DOUBLE literals (DuckDB decimals would
    * otherwise change the arithmetic), neighbor folds via
    * `list_reduce(list(c ORDER BY src))`, cut on the rounded rank. */
  def pageRankSql(iterations: Int = PageRankIterations,
      damping: Double = PageRankDamping,
      k: Int = PageRankTopK): String = {
    val d = s"CAST($damping AS DOUBLE)"
    val head =
      s"""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |p AS (
         |  SELECT a.l_partkey AS src, b2.l_partkey AS dst
         |  FROM b a JOIN b b2 ON a.l_orderkey = b2.l_orderkey
         |    AND a.l_partkey < b2.l_partkey
         |  GROUP BY 1, 2),
         |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
         |dg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
         |nn AS (SELECT COUNT(*) AS n FROM dg),
         |r0 AS (SELECT dg.src AS part, CAST(1 AS DOUBLE) / nn.n AS rank
         |       FROM dg CROSS JOIN nn)""".stripMargin
    val iters = (1 to iterations).map { i =>
      s""",
         |c$i AS (
         |  SELECT e.dst, e.src, r.rank / dg.outdeg AS c
         |  FROM e JOIN r${i - 1} r ON e.src = r.part JOIN dg ON e.src = dg.src),
         |r$i AS (
         |  SELECT c$i.dst AS part,
         |    (CAST(1 AS DOUBLE) - $d) / nn.n
         |      + $d * list_reduce(list(c ORDER BY src), (a, b) -> a + b) AS rank
         |  FROM c$i CROSS JOIN nn GROUP BY c$i.dst, nn.n)""".stripMargin
    }.mkString
    head + iters +
      s"""
         |SELECT part, round(rank, 6) AS rank FROM r$iterations
         |ORDER BY rank DESC, part LIMIT $k""".stripMargin
  }
}
