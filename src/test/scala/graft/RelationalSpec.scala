package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

class RelationalSpec extends SparkSpec {

  import spark.implicits._

  test("grouped percentiles use continuous interpolation") {
    // 4 values => p50 lands between ranks 2 and 3: 2.5; p75 at index
    // 0.75*(4-1)=2.25 => 30 + 0.25*(40-30) = 32.5.
    val li = Seq(
      ("A", 10.0), ("A", 20.0), ("A", 30.0), ("A", 40.0),
      ("B", 5.0))
      .toDF("l_returnflag", "l_quantity")
    val out = Relational.quantityPercentiles(li).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Double]("p50") == 25.0)
    assert(out("A").getAs[Double]("p75") == 32.5)
    assert(out("A").getAs[Double]("p25") == 17.5)
    assert(out("A").getAs[Long]("n_lines") == 4L)
    assert(out("B").getAs[Double]("p50") == 5.0)
  }

  test("approx_percentile (the 100TB scale path) tracks the exact percentiles") {
    // quantityPercentiles documents approx_percentile as the drop-in for
    // high-cardinality measures; pin the substitution's accuracy here so
    // the claim stays tested. accuracy=1000 => rank error <= 0.1% of rows.
    val li = Tables.lineitem(spark, sf)
    val exact = Relational.quantityPercentiles(li).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_quantity, 0.5, 1000)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    exact.foreach { case (flag, e) =>
      assert(math.abs(approx(flag) - e) <= 1.0,
        s"$flag: approx ${approx(flag)} vs exact $e")
    }
  }

  test("salted join is byte-identical to the plain join at any salt width") {
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    val plain = Relational.orderLineRevenue(orders, lineitem).collect().toSeq
    Seq(1, 4, 16).foreach { n =>
      val salted = Relational.saltedOrderLineRevenue(orders, lineitem, n).collect().toSeq
      assert(salted == plain, s"nSalts=$n diverged")
    }
  }

  test("salted join preserves left-join semantics (unmatched probe rows survive)") {
    import graft.ops.Partitioning
    val probe = Seq((1L, "a"), (2L, "b"), (99L, "miss")).toDF("k", "pv")
    val build = Seq((1L, "x"), (2L, "y")).toDF("k", "bv")
    val out = Partitioning.saltedEquiJoin(probe, build, "k",
        saltFrom = col("pv"), nSalts = 4, joinType = "left")
      .orderBy("k").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("bv")).toSeq == Seq("x", "y", null))
  }

  test("pivot fills empty cells with zero and matches conditional counts") {
    val orders = Tables.orders(spark, sf)
    val out = Relational.statusPivot(orders).collect()
    val byPriority = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val check = orders.groupBy("o_orderpriority", "o_orderstatus").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    byPriority.foreach { case (p, (f, o, pp)) =>
      assert(f == check.getOrElse((p, "F"), 0L))
      assert(o == check.getOrElse((p, "O"), 0L))
      assert(pp == check.getOrElse((p, "P"), 0L))
    }
  }

  test("range-residual join keeps only lines shipped within the window") {
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    val out = Relational.promptShipRevenue(orders, lineitem)
      .agg(sum("n_lines")).head().getLong(0)
    // Equivalent formulation: plain equi-join then filter.
    val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .count()
    assert(out == expected && expected > 0)
  }
}
