package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("interleaveBits: hand-computed Morton codes") {
    // z(x=3, y=1): x bits at even positions -> 0b0101 = 5;
    // y=1 spread then shifted -> 0b10 = 2; total 0b0111 = 7.
    val out = spark.range(1).select(
      Layout.interleaveBits(lit(3), lit(1)).as("a"),
      Layout.interleaveBits(lit(0), lit(0)).as("b"),
      Layout.interleaveBits(lit(15), lit(15)).as("c"),
      Layout.interleaveBits(lit(1), lit(0)).as("d"),
      Layout.interleaveBits(lit(0), lit(1)).as("e")).head()
    assert(out.getLong(0) == 7L)
    assert(out.getLong(1) == 0L)
    assert(out.getLong(2) == 255L) // 8 interleaved ones
    assert(out.getLong(3) == 1L)   // x -> even (LSB) position
    assert(out.getLong(4) == 2L)   // y -> odd position
  }

  test("interleaveBitsN: agrees with the 2-D fast path and hand-checks in 3-D") {
    val out = spark.range(1).select(
      Layout.interleaveBitsN(Seq(lit(3), lit(1)), bits = 4).as("two"),
      Layout.interleaveBits(lit(3), lit(1)).as("twoFast"),
      // 3-D: x=1 -> bit 0; y=1 -> bit 1; z=1 -> bit 2.
      Layout.interleaveBitsN(Seq(lit(1), lit(1), lit(1)), bits = 1).as("ones"),
      // x=2 (bit 1 of x) lands at position 1*3+0 = 3 -> 8.
      Layout.interleaveBitsN(Seq(lit(2), lit(0), lit(0)), bits = 2).as("xhi")).head()
    assert(out.getLong(0) == out.getLong(1))
    assert(out.getLong(2) == 7L)
    assert(out.getLong(3) == 8L)
    // Property: the general form equals the mask-spread 2-D fast path
    // across the whole bucket domain.
    val pairs = spark.range(256).select(
      (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
    val diff = pairs.select(
      (Layout.interleaveBitsN(Seq(col("x"), col("y")), 4) =!=
        Layout.interleaveBits(col("x"), col("y"))).as("ne"))
      .filter(col("ne")).count()
    assert(diff == 0)
  }

  test("3-column z-order prunes a 3-D box better than a 1-column sort") {
    val li = Tables.lineitem(spark, sf)
    val zDir = tempDir("graft_z3")
    val linDir = tempDir("graft_lin3")
    Layout.zorderWriteN(li, Seq("l_partkey", "l_suppkey", "l_quantity"), zDir, 16)
    Layout.linearWrite(li, "l_partkey", linDir, 16)
    def touched(dir: String): (Long, Long) = {
      val hit = spark.read.parquet(dir).filter(
        col("l_partkey").between(1, 60) && col("l_suppkey").between(1, 4) &&
          col("l_quantity").between(1, 20))
      (hit.select(input_file_name()).distinct().count(), hit.count())
    }
    val (zFiles, zRows) = touched(zDir)
    val (linFiles, linRows) = touched(linDir)
    assert(zRows == linRows && zRows > 0)
    assert(zFiles < linFiles, s"3-D z-order touched $zFiles vs linear $linFiles")
  }

  test("quantileBucket is monotone and spans the bucket range") {
    val li = Tables.lineitem(spark, sf)
    val b = li.select(col("l_partkey"),
        Layout.quantileBucket(li, "l_partkey", 16).as("bucket"))
      .groupBy("bucket")
      .agg(min("l_partkey").as("lo"), max("l_partkey").as("hi"))
      .orderBy("bucket").collect()
    assert(b.map(_.getInt(0)).min == 0 && b.map(_.getInt(0)).max == 15)
    // Monotone: bucket i's max <= bucket i+1's min (ranks don't interleave).
    b.sliding(2).foreach {
      case Array(x, y) => assert(x.getAs[Long]("hi") <= y.getAs[Long]("lo"))
      case _ =>
    }
  }

  test("zorderWrite preserves data exactly (layout only)") {
    val li = Tables.lineitem(spark, sf)
    val dir = tempDir("graft_z_data")
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", dir, nFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.unionByName(li).except(back.intersect(li)).count() == 0
      || back.except(li).count() + li.except(back).count() == 0)
  }

  test("z-order layout prunes more files than linear layout for a 2-D box") {
    val li = Tables.lineitem(spark, sf)
    val zDir = tempDir("graft_z")
    val linDir = tempDir("graft_lin")
    val files = 16
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", zDir, files)
    Layout.linearWrite(li, "l_partkey", linDir, files)
    // A box selective in BOTH dimensions. Files contributing result rows =
    // files a min/max-pruning scan must touch (matching rows in few files
    // == tight per-file bounding boxes).
    def touched(dir: String): (Long, Long) = {
      val hit = spark.read.parquet(dir)
        .filter(col("l_partkey").between(1, 40) && col("l_suppkey").between(1, 4))
      (hit.select(input_file_name()).distinct().count(), hit.count())
    }
    val (zFiles, zRows) = touched(zDir)
    val (linFiles, linRows) = touched(linDir)
    assert(zRows == linRows, "layout must not change query results")
    assert(zRows > 0, "fixture box should match something")
    // Linear layout clusters l_partkey only: the l_suppkey half of the box
    // is scattered across all partkey-matching files. The z-layout bounds
    // both dimensions, so matches concentrate in strictly fewer files.
    assert(zFiles < linFiles,
      s"z-order touched $zFiles files vs linear $linFiles — no pruning win")
  }
}
