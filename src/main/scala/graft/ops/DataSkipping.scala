package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping over plain parquet (the Delta data-skipping
  * stats analog): a manifest of per-file min/max for chosen columns,
  * consulted BEFORE the scan so non-matching files are never listed into
  * the plan at all.
  *
  * Parquet footers already carry row-group min/max — but at 100 TB the
  * scan must still LIST and OPEN every file to learn its footer says
  * "skip me". The manifest moves that knowledge into one tiny sidecar:
  * planning cost becomes O(manifest) instead of O(files), which is the
  * difference between milliseconds and a storage-metadata storm on a
  * 10⁵-file table. Delta/Iceberg keep exactly these stats in their
  * logs/manifests; this is the same design over a plain directory.
  *
  * Composes with [[Layout.zorderWrite]]: clustering gives every file a
  * tight bounding box in the indexed dimensions, which is what makes the
  * min/max intervals selective.
  *
  * Correctness: pruning by [min,max] intersection admits a SUPERSET of
  * matching files; [[prunedRead]] therefore re-applies the exact
  * predicate after the pruned scan — results are provably identical to a
  * full scan + filter (q90 hash-matches that oracle).
  */
object DataSkipping {

  val ManifestFile = "_graft_skipping.json"

  /** Per-file min/max stats for `cols` — one distributed aggregation
    * grouped by file. Driver materializes only (file × cols) stats. */
  def fileStats(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one indexed column")
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Build + persist the manifest sidecar for `dir`. Call after every
    * rewrite of the directory (layout jobs, compaction). */
  def writeManifest(spark: SparkSession, dir: String, cols: Seq[String]): Unit = {
    val stats = fileStats(spark, dir, cols)
    // JSON-lines via Spark's own JSON writer to a temp dir, then collapse
    // to the sidecar file (manifests are small by construction).
    val rows = stats.toJSON.collect()
    val p = new org.apache.hadoop.fs.Path(s"$dir/$ManifestFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write((rows.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
  }

  /** The manifest as a DataFrame (file, min_c, max_c, ...). */
  def readManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(s"$dir/$ManifestFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no skipping manifest at $p — run writeManifest first")
    val in = fs.open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    spark.read.json(raw.split("\n").filter(_.nonEmpty).toSeq.toDS())
  }

  /** Closed-interval range predicates per indexed column: `col -> (lo, hi)`. */
  type Ranges = Map[String, (Any, Any)]

  /** Files whose [min,max] interval intersects every requested range —
    * the candidate superset a pruning scan must touch. */
  def candidateFiles(spark: SparkSession, dir: String, ranges: Ranges): Seq[String] = {
    val manifest = readManifest(spark, dir)
    val keep = ranges.map { case (c, (lo, hi)) =>
      require(manifest.columns.contains(s"min_$c"),
        s"column $c is not indexed in the manifest")
      // Interval intersection: file range [min,max] meets query range
      // [lo,hi] unless disjoint. Null stats (all-null file) never match a
      // range predicate — a range query can't select null anyway.
      col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo)
    }.reduce(_ && _)
    manifest.filter(keep).select("file").collect().map(_.getString(0)).toSeq
  }

  /** Range scan through the manifest: prune files driver-side, read only
    * the survivors, re-apply the exact predicate (pruning is a superset).
    * Returns an empty frame with the directory's schema when nothing can
    * match. */
  def prunedRead(spark: SparkSession, dir: String, ranges: Ranges): DataFrame = {
    val files = candidateFiles(spark, dir, ranges)
    val residual = ranges.map { case (c, (lo, hi)) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    if (files.isEmpty)
      spark.read.parquet(dir).filter(lit(false)) // schema-preserving empty
    else
      spark.read.parquet(files: _*).filter(residual)
  }
}
