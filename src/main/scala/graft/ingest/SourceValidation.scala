package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Source-directory validation (reference S5:
  * notebooks/01_feature_table_creation.py:79-107 — `dbutils.fs.ls` + a
  * missing-file set difference, and 02_model_training.py:121-138): list the
  * directory once through the Hadoop FileSystem API (works for local paths,
  * HDFS, and object stores alike) and fail fast before any Spark job is
  * scheduled — a missing input should never cost a cluster spin-up.
  */
object SourceValidation {

  /** File names present directly under `dir` (no recursion — mirrors the
    * reference's flat `ls`). */
  def listFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"source path does not exist: $dir")
    require(fs.getFileStatus(p).isDirectory, s"source path is not a directory: $dir")
    fs.listStatus(p).map(_.getPath.getName).toSeq.sorted
  }

  /** Fail fast unless every `required` file is present under `dir`
    * (reference: set difference at 01_feature_table_creation.py:96). */
  def requireFiles(spark: SparkSession, dir: String, required: Seq[String]): Unit = {
    val present = listFiles(spark, dir).toSet
    val missing = required.filterNot(present.contains)
    require(missing.isEmpty,
      s"missing required files in $dir: ${missing.mkString(", ")} " +
        s"(found: ${present.toSeq.sorted.mkString(", ")})")
  }
}
