package graft

import java.nio.file.{Files, Paths}

/** The round-4 hygiene contract: query entries that materialize to disk
  * must not grow /tmp across invocations — one scratch copy per query
  * name, all under a single per-JVM root the shutdown hook removes. */
class WorkDirsSpec extends SparkSpec {

  test("fresh() reuses one path per name and wipes previous contents") {
    val d1 = WorkDirs.fresh("spec_probe")
    Files.createDirectories(Paths.get(d1))
    Files.write(Paths.get(d1, "leftover.txt"), "x".getBytes)
    val d2 = WorkDirs.fresh("spec_probe")
    assert(d1 == d2, "same name must map to the same path")
    assert(!Files.exists(Paths.get(d2, "leftover.txt")), "previous contents must be wiped")
    assert(Paths.get(d1).normalize.startsWith(Paths.get(WorkDirs.rootDir)))
  }

  test("repeated materializing queries do not grow the scratch root") {
    def entries(): Set[String] = {
      val root = Paths.get(WorkDirs.rootDir)
      if (!Files.exists(root)) Set.empty
      else {
        import scala.jdk.CollectionConverters._
        Files.list(root).iterator().asScala.map(_.getFileName.toString).toSet
      }
    }
    // q87 exercises the FeatureStore scratch path (create + upsert + version
    // snapshot) — the heaviest per-call disk footprint of the store queries.
    SparkEntry.queries("q87_time_travel")(spark, sf).collect()
    val after1 = entries()
    SparkEntry.queries("q87_time_travel")(spark, sf).collect()
    SparkEntry.queries("q87_time_travel")(spark, sf).collect()
    val after3 = entries()
    assert(after3 == after1,
      s"scratch root grew across invocations: ${after3 -- after1}")
    // And nothing new leaks into java.io.tmpdir itself: every graft_* entry
    // there is either the work root or a pre-existing legacy dir.
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    import scala.jdk.CollectionConverters._
    val rootName = Paths.get(WorkDirs.rootDir).getFileName.toString
    val before = Files.list(tmp).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("graft_")).toSet
    SparkEntry.queries("q90_skipping_scan")(spark, sf).collect()
    val afterQ = Files.list(tmp).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("graft_")).toSet
    assert((afterQ -- before -- Set(rootName)).isEmpty,
      s"query leaked new tmp dirs outside the work root: ${afterQ -- before -- Set(rootName)}")
  }
}
