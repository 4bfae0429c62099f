package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given scale
  * factor and prints one JSON line. Each query is materialized through the
  * noop sink — unlike count(), this computes every output column (count()
  * would let Catalyst prune the projections and under-report the work). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on the smallest SF so per-query timings measure the
    // query, not first-use compilation of the whole SQL stack.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Local-iteration filter: SPARK_GRAFT_ONLY=q28_...,q32_... times just
    // those queries. Unset (the driver's invocation) => full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Best-of-2 per query: a single timed pass is defenseless against
      // co-tenant machine load (transient contention inflates one run by an
      // order of magnitude). The minimum of two independent runs is a robust
      // estimate of the query's true cost; the cache is cleared between runs
      // so the second pass redoes the work instead of replaying cached
      // blocks — we measure the plan, not the block manager.
      var failed = false
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // Defensive isolation: no run inherits another's cached blocks
        // (iterative ops cache intermediates; stale blocks skew timings).
        spark.catalog.clearCache()
        dt
      }
      val base = Seq(once(), once())
      // Adaptive third run: when the two timings disagree by >2x, the
      // machine was contended during at least one of them (co-tenant CPU
      // steal stretched wall time) — a third sample keeps one transient
      // spike from poisoning the min. Bounded: at most one extra run, only
      // for queries whose own evidence shows interference.
      val times =
        if (!failed && base.max > 2 * base.min + 0.5) base :+ once() else base
      val dt = times.min
      System.err.println(
        f"[bench] $name%-28s $dt%8.2f s  (runs: ${times.map(t => f"$t%.2f").mkString(", ")})" +
          (if (failed) "  FAILED" else ""))
      (name, dt, failed)
    }
    // A failed query's time-to-exception is NOT a measurement — reporting it
    // would let a fast failure masquerade as a fast query. Failures are
    // excluded from `queries`/total and listed explicitly.
    val ok = results.collect { case (k, v, false) => k -> v }
    val failedNames = results.collect { case (k, _, true) => k }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
