package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.dedup.Dedup
import graft.fs.{FeatureLookup, TrainingSet}

/** ScalaCheck properties (SURVEY.md §5 item 3): lookup-join row-count
  * invariance, dedup idempotence, split partition — run through raw
  * ScalaCheck (no scalatest bridge in the offline cache). Case counts are
  * small: each case spins Spark jobs. */
class PropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, cases: Int = 5): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  test("property: lookup join preserves fact row count when feature PK unique") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0, 50)), Gen.listOf(Gen.choose(0, 50))) {
      (factKeys: List[Int], featKeyList: List[Int]) =>
        val facts = factKeys.toDF("k")
        val features = featKeyList.distinct.map(k => (k, k * 2)).toDF("k", "v")
        val out = TrainingSet.fromFrames(
          facts, Seq(FeatureLookup("f", Seq("v"), "k") -> features)).loadDf
        out.count() == factKeys.size.toLong
    })
  }

  test("property: exact dedup keeps one row per distinct text with unique hashes") {
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "dd", "ee", "f g h"))) {
      (texts: List[String]) =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val out = Dedup.exactDedup(docs)
        val n = out.count()
        n == texts.distinct.size.toLong &&
          out.select("content_hash").distinct().count() == n
    })
  }

  test("property: random split partitions the data for any seed") {
    check(Prop.forAll(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)) { (seed: Long) =>
      val df = (1 to 200).map(i => (i, i % 2)).toDF("id", "label")
      val Array(train, test) = df.randomSplit(Array(0.8, 0.2), seed)
      train.count() + test.count() == 200L &&
        train.join(test, Seq("id"), "left_semi").count() == 0L
    }, cases = 3)
  }
}
