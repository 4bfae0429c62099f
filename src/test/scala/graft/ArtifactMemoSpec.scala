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
    // Fingerprint change (corpus overwritten): rebuild, same stable path.
    assert(memo.getOrBuild("corpusA", "fp2")(build) == pA)
    assert(builds == 3)
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
