package graft

import org.apache.spark.sql.functions._

import graft.ops.{DataSkipping, Layout}

class DataSkippingSpec extends SparkSpec {

  private lazy val li = Tables.lineitem(spark, sf)

  private def zDir: String = {
    val dir = tempDir("graft_skip")
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", dir, nFiles = 8)
    DataSkipping.writeManifest(spark, dir, Seq("l_partkey", "l_suppkey"))
    dir
  }

  test("manifest has one row per file with per-column min/max") {
    val dir = zDir
    val m = DataSkipping.readManifest(spark, dir).collect()
    val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(m.length == files)
    m.foreach { r =>
      assert(r.getAs[Long]("min_l_partkey") <= r.getAs[Long]("max_l_partkey"))
      assert(r.getAs[Long]("min_l_suppkey") <= r.getAs[Long]("max_l_suppkey"))
    }
  }

  test("prunedRead equals full scan + filter exactly") {
    val dir = zDir
    val ranges: DataSkipping.Ranges =
      Map("l_partkey" -> (1L, 60L), "l_suppkey" -> (1L, 3L))
    val pruned = DataSkipping.prunedRead(spark, dir, ranges)
      .select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber")
    val full = spark.read.parquet(dir)
      .filter(col("l_partkey").between(1, 60) && col("l_suppkey").between(1, 3))
      .select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber")
    assert(full.count() > 0, "fixture box should match rows")
    assert(pruned.collect().toSeq == full.collect().toSeq)
  }

  test("the manifest actually skips files for a selective box") {
    val dir = zDir
    val total = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    val cands = DataSkipping.candidateFiles(spark, dir,
      Map("l_partkey" -> (1L, 60L), "l_suppkey" -> (1L, 3L)))
    assert(cands.nonEmpty)
    assert(cands.length < total,
      s"no skipping: ${cands.length} of $total files survived pruning")
  }

  test("a range outside the data prunes everything and returns a typed empty frame") {
    val dir = zDir
    val out = DataSkipping.prunedRead(spark, dir,
      Map("l_partkey" -> (99999999L, 999999999L)))
    assert(out.isEmpty)
    assert(out.columns.contains("l_quantity")) // schema preserved
  }

  test("a stale manifest fails loudly instead of silently dropping new files") {
    val dir = zDir
    // Drift the directory after writeManifest: add one more data file.
    li.limit(10).write.mode("append").parquet(dir)
    val err = intercept[IllegalArgumentException] {
      DataSkipping.prunedRead(spark, dir, Map("l_partkey" -> (1L, 60L)))
    }
    assert(err.getMessage.contains("stale skipping manifest"), err.getMessage)
    // Re-running writeManifest heals it and the new rows are visible.
    DataSkipping.writeManifest(spark, dir, Seq("l_partkey", "l_suppkey"))
    val full = spark.read.parquet(dir)
      .filter(col("l_partkey").between(1L, 60L)).count()
    val pruned = DataSkipping.prunedRead(spark, dir, Map("l_partkey" -> (1L, 60L))).count()
    assert(pruned == full)
  }

  test("unindexed columns are rejected with a clear error") {
    val dir = zDir
    val err = intercept[IllegalArgumentException] {
      DataSkipping.candidateFiles(spark, dir, Map("l_quantity" -> (1L, 2L)))
    }
    assert(err.getMessage.contains("not indexed"))
  }
}
