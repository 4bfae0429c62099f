package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {

  import spark.implicits._

  /** Corpus with one exact dup pair and one near-dup pair. */
  private lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2L, "the quick brown fox jumps over the lazy cat and runs far away home"),
    (3L, "completely different text about spark query engines and columnar scans"),
    (4L, "another unrelated document mentioning feature stores and lookups only")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps min doc_id") {
    val out = Dedup.exactDedup(corpus).collect()
    assert(out.length == 4)
    val dupRow = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupRow.getAs[Long]("doc_id") == 0L)
  }

  test("exact dedup is idempotent") {
    val once = Dedup.exactDedup(corpus)
    val reps = corpus.join(once.select("doc_id"), Seq("doc_id"), "left_semi")
    val twice = Dedup.exactDedup(reps)
    assert(twice.count() == once.count())
  }

  test("shingles produce n-grams; short docs collapse to whole text") {
    val sh = corpus.select(Dedup.shingles(col("text"), 3).as("sh")).head().getSeq[String](0)
    assert(sh.head == "the quick brown")
    val tiny = Seq((9L, "two words")).toDF("doc_id", "text")
    val tinySh = tiny.select(Dedup.shingles(col("text"), 3).as("sh")).head().getSeq[String](0)
    assert(tinySh == Seq("two words"))
  }

  test("ngram jaccard finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(corpus, minJaccard = 0.2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 3L || b == 4L || a == 3L || a == 4L })
  }

  test("minhash pairs finds the exact dup; clustering collapses it") {
    val pairs = Dedup.minHashPairs(corpus, maxDistance = 0.5)
    val pairSet = pairs.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairSet.contains((0L, 1L)))
    val clusters = Dedup.clusterPairs(corpus, pairs)
    val byDoc = clusters.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(byDoc(0L) == byDoc(1L))
    val reps = clusters.filter(col("is_representative")).count()
    assert(reps < 5) // at least the 0/1 pair collapsed
  }

  test("cluster propagation handles chains (a-b, b-c => one cluster)") {
    val docs = Seq((10L, "x"), (11L, "x"), (12L, "x")).toDF("doc_id", "text")
    val chain = Seq((10L, 11L), (11L, 12L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterPairs(docs, chain).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out.values.toSet == Set(10L))
  }
}
