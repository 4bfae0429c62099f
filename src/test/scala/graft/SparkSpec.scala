package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: local[4], shuffle=4, UTC — matches the
  * driver harness pinning (SURVEY.md §7.5 risk 1). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .appName("graft-test")
    .getOrCreate()

  lazy val sf: String = "/root/testdata/sf0.001"

  /** Spec scratch dir: unique per call (suites mint several stores per
    * test), but under the per-JVM [[WorkDirs]] root so its shutdown hook
    * leaves /tmp flat after the test JVM exits — raw
    * `Files.createTempDirectory` leaked one dir per store per run. */
  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(WorkDirs.rootDir), prefix).toString

  def refData(file: String): String = s"/root/reference/data/$file"
}
