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

  test("distributed ntileAssign equals Spark's global-window ntile row-for-row") {
    val li = Tables.lineitem(spark, sf)
      .select("l_extendedprice", "l_orderkey", "l_linenumber")
    // k=7 does not divide the row count, so both remainder branches of the
    // bucket formula are exercised.
    val viaOp = Relational.ntileAssign(
      li, "l_extendedprice", Seq("l_orderkey", "l_linenumber"), 7)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val viaWindow = li.withColumn("bin", ntile(7).over(w))
    assert(viaOp.count() == viaWindow.count())
    assert(viaOp.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaOp).count() == 0)
  }

  test("funnel: strict ordering and the conversion window gate each stage") {
    import java.sql.Timestamp
    def ts(h: Int) = new Timestamp(h * 3600L * 1000L)
    // u1 completes view->click in-window; its purchase lands 30h after the
    // click (outside 24h). u2 never clicks. u3 clicks 25h after the view
    // (outside). u4 clicks BEFORE its first view (wrong order).
    val ev = Seq(
      (1L, ts(0), "view"), (1L, ts(2), "click"), (1L, ts(33), "purchase"),
      (2L, ts(0), "view"),
      (3L, ts(0), "view"), (3L, ts(25), "click"),
      (4L, ts(5), "click"), (4L, ts(6), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = graft.ops.Events.funnel(ev).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("users")).toMap
    assert(out == Map("view" -> 4L, "click" -> 1L, "purchase" -> 0L))
  }

  test("cohortRetention: cohort day is the first purchase; offsets count distinct active days") {
    import java.sql.Timestamp
    def day(d: Int, h: Int = 0) =
      new Timestamp(((d * 24L + h) * 3600L) * 1000L)
    // u1: purchases on day0 (twice) and day2 -> cohort day0, offsets {0, 2}.
    // u2: first purchase day1, again day1 and day3 -> cohort day1, offsets {0, 2}.
    // Views never count.
    val ev = Seq(
      (1L, day(0, 1), "purchase"), (1L, day(0, 5), "purchase"),
      (1L, day(2), "purchase"), (1L, day(9), "view"),
      (2L, day(1), "purchase"), (2L, day(1, 7), "purchase"),
      (2L, day(3), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = graft.ops.Events.cohortRetention(ev).collect()
      .map(r => (r.getTimestamp(0).getTime / 86400000L,
        r.getInt(1), r.getLong(2)))
      .toSet
    assert(out == Set((0L, 0, 1L), (0L, 2, 1L), (1L, 0, 1L), (1L, 2, 1L)))
  }

  test("co-purchase pairs count orders, not lineitems, and break ties totally") {
    import spark.implicits._
    // Order 10: parts {1, 2, 3}; order 20: parts {1, 2} with part 2 twice
    // (two lineitems - must count once); order 30: part 1 alone (no pairs).
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 2L),
      (30L, 1L))
      .toDF("l_orderkey", "l_partkey")
    val got = graft.ops.Relational.coPurchasePairs(li, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("z-score normalization: zero mean, unit sample variance per group") {
    import spark.implicits._
    val cust = Tables.customer(spark, sf)
    val z = graft.ops.Relational.zscoreNormalize(cust).collect()
      .map(r => (r.getString(1), r.getDouble(3)))
    assert(z.length == cust.count().toInt)
    z.groupBy(_._1).foreach { case (seg, rows) =>
      val v = rows.map(_._2)
      val mean = v.sum / v.length
      val sv = v.map(x => (x - mean) * (x - mean)).sum / (v.length - 1)
      assert(math.abs(mean) < 1e-4, s"$seg z mean $mean not ~0")
      assert(math.abs(sv - 1.0) < 1e-3, s"$seg z variance $sv not ~1")
    }
    // Hand case: values 1.00, 2.00, 3.00 -> mean 2, sd 1 -> z = -1, 0, 1.
    val tiny = Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val got = graft.ops.Relational.zscoreNormalize(tiny).collect()
      .map(_.getDouble(3)).toSeq
    assert(got == Seq(-1.0, 0.0, 1.0))
  }

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"$s 00:00:00")

  test("scd2Build collapses runs and bounds validity intervals") {
    import spark.implicits._
    // cust 1: A, A, B, A -> three versions (run of A collapses); cust 2:
    // single order -> one open interval.
    val orders = Seq(
      (1L, 10L, ts("1995-01-01"), "A"),
      (1L, 11L, ts("1995-02-01"), "A"),
      (1L, 12L, ts("1995-03-01"), "B"),
      (1L, 13L, ts("1995-04-01"), "A"),
      (2L, 20L, ts("1996-01-01"), "C"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val out = Relational.scd2Build(orders).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 1, "A", ts("1995-01-01"), Some(ts("1995-03-01")), false),
      (1L, 2, "B", ts("1995-03-01"), Some(ts("1995-04-01")), false),
      (1L, 3, "A", ts("1995-04-01"), None, true),
      (2L, 1, "C", ts("1996-01-01"), None, true)))
  }

  test("scd2Build resolves same-instant changes by the o_orderkey tiebreak") {
    import spark.implicits._
    val orders = Seq(
      (1L, 11L, ts("1995-01-01"), "B"),
      (1L, 10L, ts("1995-01-01"), "A"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val out = Relational.scd2Build(orders).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getBoolean(5)))
    assert(out.toSeq == Seq((1, "A", false), (2, "B", true)))
  }

  test("trailingIntervalAgg covers a 30-day time span, same-day rows are peers") {
    import spark.implicits._
    val orders = Seq(
      (10L, 1L, ts("1995-01-01"), 1.00),  // day 0
      (11L, 1L, ts("1995-01-11"), 2.00),  // day 10
      (12L, 1L, ts("1995-01-30"), 4.00),  // day 29: covers 0,10,29
      (13L, 1L, ts("1995-01-31"), 8.00),  // day 30: covers 10,29,30 (day 0 ages out)
      (14L, 1L, ts("1995-04-11"), 16.00), // day 100: alone
      (15L, 2L, ts("1995-01-05"), 1.00),  // same-day peers: both see both
      (16L, 2L, ts("1995-01-05"), 2.00))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.trailingIntervalAgg(orders).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out(10L) == ((1L, 100L)))
    assert(out(11L) == ((2L, 300L)))
    assert(out(12L) == ((3L, 700L)))
    assert(out(13L) == ((3L, 1400L)))
    assert(out(14L) == ((1L, 1600L)))
    assert(out(15L) == ((2L, 300L)) && out(16L) == ((2L, 300L)))
  }

  test("madOutliers flags only deviations beyond k normalized MADs") {
    import spark.implicits._
    // cents: 100,200,300,400,10000 -> median 300, ads 200,100,0,100,9700,
    // MAD 100 -> cut 3.5*1.4826*100 = 518.9: only the 100.00 row flags.
    val events = Seq(
      (1L, "view", 1.00), (2L, "view", 2.00), (3L, "view", 3.00),
      (4L, "view", 4.00), (5L, "view", 100.00),
      // Degenerate group: MAD = 0 (majority at the median) -> no flags,
      // even for the wild value.
      (6L, "click", 5.00), (7L, "click", 5.00), (8L, "click", 5.00),
      (9L, "click", 999.00))
      .toDF("event_id", "event_type", "value")
    val out = Relational.madOutliers(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(out.length == 1)
    val (tpe, id, z) = out.head
    assert(tpe == "view" && id == 5L)
    assert(math.abs(z - 9700.0 / (1.4826 * 100.0)) < 1e-6)
  }

  test("orderStreaks labels islands across year boundaries") {
    import spark.implicits._
    // c1: Jan-Mar 2020 then Jun 2020 (two orders in Feb collapse to one
    // active month). c2: Dec 2019 + Jan 2020 — consecutive ACROSS the
    // year boundary, the case naive month arithmetic breaks.
    val orders = Seq(
      (1L, "2020-01-15"), (1L, "2020-02-01"), (1L, "2020-02-20"),
      (1L, "2020-03-05"), (1L, "2020-06-01"),
      (2L, "2019-12-31"), (2L, "2020-01-01"))
      .toDF("o_custkey", "d")
      .select(col("o_custkey"), to_timestamp(col("d")).as("o_orderdate"))
    val out = Relational.orderStreaks(orders).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getTimestamp(4).toString)))
      .toMap
    assert(out(1L) == ((4L, 2L, 3, "2020-01-01 00:00:00.0")))
    assert(out(2L) == ((2L, 1L, 2, "2019-12-01 00:00:00.0")))
  }

  test("winsorize clamps into the segment's [p05, p95] band") {
    import spark.implicits._
    // 21 values, 1.00..21.00: p05 = index 0.05*20 = 1 -> 2.00 exactly,
    // p95 = index 19 -> 20.00. Ends clip, interior passes through.
    val customers = (1 to 21).map(i => (i.toLong, "SEG", i.toDouble))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val out = Relational.winsorize(customers).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((2.0, true, false)))
    assert(out(2L) == ((2.0, false, false)))
    assert(out(10L) == ((10.0, false, false)))
    assert(out(20L) == ((20.0, false, false)))
    assert(out(21L) == ((20.0, false, true)))
  }

  test("paretoFrontier keeps exactly the non-dominated parts") {
    import spark.implicits._
    // (price, size): duplicates on the frontier both survive (dominance
    // needs one STRICT edge); same-price smaller sizes die; equal-size
    // costlier parts die.
    val part = Seq(
      (1L, "a", 0.50, 1), (2L, "b", 1.00, 5), (3L, "c", 1.00, 5),
      (4L, "d", 1.00, 3), (5L, "e", 2.00, 5), (6L, "f", 2.00, 7),
      (7L, "g", 3.00, 7))
      .toDF("p_partkey", "p_name", "p_retailprice", "p_size")
    val out = Relational.paretoFrontier(part).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 3L, 6L))
  }

  test("paretoFrontier matches the quadratic dominance check on real data") {
    val part = Tables.part(spark, sf).select("p_partkey", "p_name", "p_retailprice", "p_size")
    val fast = Relational.paretoFrontier(part).collect().map(_.getLong(0)).toSet
    val rows = part.collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    val slow = rows.filter { case (_, p, s) =>
      !rows.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }
    }.map(_._1).toSet
    assert(fast == slow)
  }

  test("weightedMedian picks the smallest value whose cum weight reaches half") {
    import spark.implicits._
    // Group A: values 1,2,3 with weights 1.00, 1.00, 5.00 -> total 7.00;
    // cum crosses 3.5 at value 3. Group B: 10 with weight 2.00, 20 with
    // 2.00 -> cum(10)=2.00, 2*200 >= 400 exactly -> median 10 (the
    // at-half boundary belongs to the lower value).
    val li = Seq(
      ("A", 1.0, 1.00), ("A", 2.0, 1.00), ("A", 3.0, 5.00),
      ("B", 10.0, 2.00), ("B", 20.0, 2.00))
      .zipWithIndex.map { case ((f, q, p), i) => (f, q, p, i.toLong, i) }
      .toDF("l_returnflag", "l_quantity", "l_extendedprice",
        "l_orderkey", "l_linenumber")
    val out = Relational.weightedMedian(li).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out("A") == ((3.0, 700L)))
    assert(out("B") == ((10.0, 400L)))
  }

  test("scd2Apply equals the full rebuild at any append-only split") {
    val orders = Tables.orders(spark, sf)
    val full = Relational.scd2Build(orders).collect().map(_.toSeq).toSeq
    Seq("1996-01-01", "1999-01-01", "2001-01-01").foreach { cut =>
      val c = lit(cut).cast("timestamp")
      val inc = Relational.scd2Apply(
        Relational.scd2Build(orders.filter(col("o_orderdate") < c)),
        orders.filter(col("o_orderdate") >= c))
        .collect().map(_.toSeq).toSeq
      assert(inc == full, s"split at $cut diverged from the full rebuild")
    }
    // Degenerate splits: empty batch (apply must be a no-op union) and
    // empty history (apply must equal building from the batch alone).
    val none = orders.filter(lit(false))
    val emptyBatch = Relational.scd2Apply(Relational.scd2Build(orders), none)
      .collect().map(_.toSeq).toSeq
    assert(emptyBatch == full)
    val emptyHist = Relational.scd2Apply(Relational.scd2Build(none), orders)
      .collect().map(_.toSeq).toSeq
    assert(emptyHist == full)
  }

  test("scd2Apply rejects a batch that violates the append-only contract") {
    import spark.implicits._
    val hist = Relational.scd2Build(Seq(
      (1L, 10L, ts("1995-01-01"), "A"),
      (1L, 11L, ts("1996-01-01"), "B"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"))
    // A batch row dated BEFORE key 1's open interval (1996-01-01) sorts
    // ahead of the seed row — without the guard this silently yields a
    // history differing from the full rebuild; with it the job fails loud.
    val bad = Seq((1L, 12L, ts("1995-06-01"), "C"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val e = intercept[Exception] {
      Relational.scd2Apply(hist, bad).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("append-only contract violated")),
      s"wrong failure: $e")
    // At-or-after the open interval is fine — including the exact tie,
    // which the seed's -1 orderkey resolves in the seed's favor.
    val ok = Seq((1L, 12L, ts("1996-01-01"), "C"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    val rows = Relational.scd2Apply(hist, ok).collect()
    assert(rows.count(_.getBoolean(5)) == 1)
    // A violating batch against a key with NO open interval (new key) is
    // not a violation — nothing to sort ahead of.
    val newKey = Seq((9L, 90L, ts("1990-01-01"), "Z"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
    assert(Relational.scd2Apply(hist, newKey).collect().nonEmpty)
  }

  test("scd2PointInTime attaches the version current at each fact's date") {
    import spark.implicits._
    // Customer 7's priority: P1 from 1995-03-01, P2 from 1998-01-01.
    // Facts re-date as 1995-01-01 + event_id % 2400 days:
    //   id 0    -> 1995-01-01 (before any version -> null)
    //   id 100  -> 1995-04-11 (inside P1)
    //   id 1200 -> 1998-04-16 (inside P2, the open interval)
    val orders = Seq(
      (7L, 1L, "1995-03-01", "P1"),
      (7L, 2L, "1996-06-01", "P1"), // no change — must not create a version
      (7L, 3L, "1998-01-01", "P2"))
      .toDF("o_custkey", "o_orderkey", "d", "o_orderpriority")
      .select(col("o_custkey"), col("o_orderkey"),
        to_timestamp(col("d")).as("o_orderdate"), col("o_orderpriority"))
    val events = Seq((0L, 7L), (100L, 7L), (1200L, 7L), (5L, 99L))
      .toDF("event_id", "user_id")
    val out = Relational.scd2PointInTime(events, orders).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out(0L).isEmpty)
    assert(out(100L).contains("P1"))
    assert(out(1200L).contains("P2"))
    assert(out(5L).isEmpty) // unknown customer
  }

  test("incrementalJoinRevenue equals the plain join at any cut") {
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("revenue_cents"))
      .orderBy("o_orderpriority")
      .collect().map(_.toSeq).toSeq
    Seq("1995-01-01", "1999-01-01", "2002-01-01").foreach { cut =>
      val inc = Relational.incrementalJoinRevenue(orders, lineitem, cut)
        .collect().map(_.toSeq).toSeq
      assert(inc == plain, s"cut $cut diverged from the plain join")
    }
  }

  test("slicedRunningMax equals a single global running-max window") {
    import spark.implicits._
    val df = (1 to 500).map(i => (((i * 37) % 101).toDouble, i.toLong))
      .toDF("v", "id")
    val got = graft.ops.Partitioning
      .slicedRunningMax(df, "v", Seq("id"), col("id") % 7, "strict", "leq")
      .collect().map(r => (r.getDouble(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val rows = (1 to 500).map(i => (((i * 37) % 101).toDouble, i.toLong, i.toLong % 7))
      .sortBy(t => (t._1, t._2))
    val expected = rows.zipWithIndex.map { case ((v, id, m), ix) =>
      val before = rows.take(ix).map(_._3)
      (v, id, if (before.isEmpty) None else Some(before.max),
        (m +: before).max)
    }
    assert(got.toSeq == expected)
  }
}
