package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Plan-capture tool for the optimization rounds: writes
  * `df.explain("formatted")` output for every (or a selected subset of)
  * declared query to `<outDir>/<name>_<suffix>.txt`, under the SAME session
  * configuration as [[Bench]] — shuffle partitions from SPARK_GRAFT_CPUS,
  * AQE on — so the captured plan is the plan the bench actually runs
  * (modulo AQE's runtime re-optimization, which `explain` shows as the
  * isFinalPlan=false initial plan).
  *
  * Usage: runMain graft.Plans <sfDir> <outDir> <suffix>
  * with optional SPARK_GRAFT_ONLY=q01_...,q02_... to restrict. Index-backed
  * queries get their artifacts warmed first (same off-the-clock hook the
  * bench uses), so their plans reflect warm-index probes, not builds. */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Plans <sfDir> <outDir> <suffix>")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) =>
        (SparkEntry.queries ++ SparkEntry.benchExtras).filter { case (k, _) => names(k) }
      case None => SparkEntry.queries
    }
    Files.createDirectories(Paths.get(outDir))
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        if (SparkEntry.IndexBackedQueries(name)) SparkEntry.warmIndexes(spark, sfDir)
        val df = fn(spark, sfDir)
        // queryExecution.explainString is the same text explain() prints.
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        System.err.println(s"[plans] $name written")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
      } finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
