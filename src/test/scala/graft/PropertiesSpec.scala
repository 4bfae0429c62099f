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

  test("property: as-of join equals the brute-force reference on random data") {
    val factGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0, 4); t <- Gen.choose(0L, 20L)
    } yield (k, t))
    val featGen = Gen.listOf(for {
      k <- Gen.choose(0, 4); t <- Gen.choose(0L, 20L); v <- Gen.choose(0, 99)
    } yield (k, t, v))
    check(Prop.forAll(factGen, featGen) { (factRows, featRowsRaw) =>
      // Feature versions unique per (key, ts) — the documented contract.
      val featRows = featRowsRaw.groupBy(r => (r._1, r._2))
        .map(_._2.maxBy(_._3)).toList
      val facts = factRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("fact_id", "k", "ts")
      val features = featRows.toDF("k", "fts", "v")
      val got = graft.ops.AsOfJoin.asOf(facts, features, Seq("k"), "ts", "fts", Seq("v"))
        .collect()
        .map(r => r.getAs[Long]("fact_id") -> Option(r.get(r.fieldIndex("v")))).toMap
      val want = factRows.zipWithIndex.map { case ((k, t), i) =>
        val eligible = featRows.filter(f => f._1 == k && f._2 <= t)
        i.toLong -> (if (eligible.isEmpty) None
                     else Some(eligible.maxBy(_._2)._3))
      }.toMap
      got == want
    })
  }

  test("property: winnowing fingerprints are shift-invariant on shared cores") {
    // Winnowing guarantee (Schleimer et al.): substrings of length >=
    // window + k - 1 shared between two docs always share a fingerprint.
    val wordGen = Gen.oneOf("alpha", "bravo", "charlie", "delta", "echo", "fox")
    check(Prop.forAll(Gen.listOfN(12, wordGen), Gen.listOfN(3, wordGen)) {
      (coreWords, prefixWords) =>
        val core = coreWords.mkString(" ")
        val docs = Seq((1L, core), (2L, prefixWords.mkString(" ") + " " + core))
          .toDF("doc_id", "text")
        val fps = graft.text.TextOps.winnowingFingerprints(docs).collect()
          .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }
        (fps(1) & fps(2)).nonEmpty
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
