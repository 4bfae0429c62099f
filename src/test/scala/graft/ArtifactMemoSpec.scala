package graft

class ArtifactMemoSpec extends SparkSpec {

  test("artifact paths are key-unique; a second corpus cannot wipe the first") {
    // Round-9 advice defect: the near-dup index memo wrote every corpus's
    // artifact to ONE shared fresh() path, so building B wiped A's files
    // while A's memo entry stayed fingerprint-valid — silent wrong results.
    val memo = new ArtifactMemo("amemo_spec")
    var builds = 0
    def build(p: String): Unit = {
      builds += 1
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
      java.nio.file.Files.write(java.nio.file.Paths.get(p, "marker"),
        p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val pA = memo.getOrBuild("corpusA", "fp1")(build)
    val pB = memo.getOrBuild("corpusB", "fp1")(build)
    assert(pA != pB, "two corpora share an artifact path")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(pA, "marker")),
      "building corpus B destroyed corpus A's artifact")
    // Memo hit: no rebuild while the fingerprint matches.
    assert(memo.getOrBuild("corpusA", "fp1")(build) == pA)
    assert(builds == 2)
    // Fingerprint change (corpus overwritten): rebuild into a NEW
    // generation path — the superseded generation survives this build
    // (round-10 ask #4; the generation test below covers the full cycle).
    val pA2 = memo.getOrBuild("corpusA", "fp2")(build)
    assert(pA2 != pA, "staleness rebuild reused the live generation's path")
    assert(builds == 3)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(pA, "marker")),
      "staleness rebuild destroyed the superseded generation immediately")
  }

  test("a reader over the superseded generation finishes; the next rebuild reclaims it") {
    // Round-10 residual: on staleness the rebuild wiped the SAME
    // corpus-unique dir a live stream could be lazily reading. Paths now
    // embed the fingerprint hash: a rebuild writes a NEW generation, the
    // pointer swaps after the build, and the superseded generation is
    // reclaimed only at the NEXT staleness event — so disk stays bounded
    // at two generations per key while any in-flight reader survives one
    // corpus rewrite.
    val memo = new ArtifactMemo("amemo_gen")
    def build(rows: Seq[Int])(p: String): Unit = {
      import spark.implicits._
      rows.toDF("v").write.parquet(s"$p/t")
    }
    val g1 = memo.getOrBuild("corpus", "fp1")(build(Seq(1, 2, 3)))
    // A lazy reader opens generation 1 before the corpus is rewritten …
    val reader = spark.read.parquet(s"$g1/t")
    // … the rewrite lands generation 2 at a DIFFERENT path …
    val g2 = memo.getOrBuild("corpus", "fp2")(build(Seq(4, 5)))
    assert(g2 != g1)
    // … and the old reader still finishes on the old generation's files.
    assert(reader.count() == 3)
    // The memo pointer serves generation 2 (no rebuild on hit).
    assert(memo.getOrBuild("corpus", "fp2")(p =>
      fail(s"memo hit rebuilt at $p")) == g2)
    assert(spark.read.parquet(s"$g2/t").count() == 2)
    // The NEXT staleness event reclaims generation 1 and keeps 2 and 3.
    val g3 = memo.getOrBuild("corpus", "fp3")(build(Seq(6)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(g1)),
      "generation two rebuilds back was not reclaimed")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(g2, "t")))
    assert(spark.read.parquet(s"$g3/t").count() == 1)
  }

  test("concurrent same-key callers build once; distinct keys build in parallel") {
    val memo = new ArtifactMemo("amemo_conc")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = memo.getOrBuild("sharedKey", "fp") { p =>
            Thread.sleep(50) // widen the race window
            builds.incrementAndGet()
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
            ()
          }
        })
      }
      val paths = tasks.map(_.get()).toSet
      assert(paths.size == 1)
      assert(builds.get == 1, s"same-key build ran ${builds.get} times")
    } finally pool.shutdown()
  }
}
