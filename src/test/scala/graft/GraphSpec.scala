package graft

import graft.ops.Graph

class GraphSpec extends SparkSpec {

  import spark.implicits._

  /** Path graph A(10)–B(20)–C(30): orders {1: (10, 20), 2: (20, 30)} give
    * symmetric edges 10↔20, 20↔30; degrees 1/2/1; N = 3. */
  private lazy val lineitem = Seq(
    (1L, 10L), (1L, 20L), (2L, 20L), (2L, 30L))
    .toDF("l_orderkey", "l_partkey")

  test("pagerank: hand-computed path graph, 1 and 3 iterations") {
    // r0 = 1/3 each. Iteration 1:
    //   r(10) = r(30) = 0.15/3 + 0.85 * (1/3)/2     = 0.191667
    //   r(20) =         0.15/3 + 0.85 * (1/3 + 1/3) = 0.616667
    val one = Graph.coPurchasePageRank(lineitem, iterations = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(one.map(_._1).toSeq == Seq(20L, 10L, 30L)) // rank desc, part asc ties
    assert(math.abs(one(0)._2 - 0.616667) < 1e-6)
    assert(math.abs(one(1)._2 - 0.191667) < 1e-6)
    assert(math.abs(one(2)._2 - 0.191667) < 1e-6)

    // Three iterations: mass keeps oscillating between the center and the
    // leaves but always sums to 1 (no dangling nodes in the symmetric
    // graph), and the center stays on top.
    val three = Graph.coPurchasePageRank(lineitem)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(three.map(_._1).toSeq == Seq(20L, 10L, 30L))
    assert(math.abs(three.map(_._2).sum - 1.0) < 1e-5)
    val base = 0.15 / 3
    val leaf1 = base + 0.85 * ((1.0 / 3) / 2)     // r(10) after iter 1
    val center2 = base + 0.85 * (2 * leaf1)       // r(20) after iter 2
    val leaf3 = base + 0.85 * (center2 / 2)       // r(10) after iter 3
    assert(math.abs(three.find(_._1 == 10L).get._2 - leaf3) < 1e-6)
  }

  test("pagerank: duplicate lineitem rows do not change the graph") {
    // The basket distinct and the pair distinct mean row duplication in
    // lineitem (multiple line items of one part in one order) is invisible.
    val dup = lineitem.union(lineitem)
    val a = Graph.coPurchasePageRank(lineitem).collect().map(_.toSeq).toSeq
    val b = Graph.coPurchasePageRank(dup).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("pagerank oracle SQL embeds the engine constants") {
    val sql = Graph.pageRankSql()
    assert(sql.contains(s"LIMIT ${Graph.PageRankTopK}"))
    assert(sql.contains(s"r${Graph.PageRankIterations}"))
    assert(sql.contains(s"CAST(${Graph.PageRankDamping} AS DOUBLE)"))
  }
}
