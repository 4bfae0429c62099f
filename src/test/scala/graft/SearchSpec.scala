package graft

import graft.text.Search

class SearchSpec extends SparkSpec {

  import spark.implicits._

  test("bm25 matches a hand-computed score on a tiny corpus") {
    val corpus = Seq(
      (1L, "a b a"), // tf(a)=2, dl=3
      (2L, "a c"),   // tf(a)=1, dl=2
      (3L, "d d d"), // tf(d)=3, dl=3
      (4L, "e f g h")) // no query terms
      .toDF("doc_id", "text")
    val terms = Seq("a", "d")
    val out = Search.bm25TopK(corpus, terms, k = 10).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))

    // Reference computation with the exact same formula.
    val nDocs = 4.0
    val avgdl = (3 + 2 + 3 + 4) / 4.0
    val k1 = 1.2
    val b = 0.75
    def idf(df: Int) = math.log(1 + (nDocs - df + 0.5) / (df + 0.5))
    def score(tf: Long, dl: Int, df: Int) =
      idf(df) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    val expected = Map(
      1L -> score(2, 3, 2), // 'a' in docs 1,2 => df=2
      2L -> score(1, 2, 2),
      3L -> score(3, 3, 1)) // 'd' only in doc 3
    out.foreach { r =>
      val got = r.getDouble(1)
      val want = math.rint(expected(r.getLong(0)) * 1e6) / 1e6
      assert(math.abs(got - want) < 1e-9, s"doc ${r.getLong(0)}: got $got want $want")
    }
    val matched = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(matched == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("bm25 sums over multiple matched terms and ranks deterministically") {
    val corpus = Seq(
      (1L, "a d"),   // both terms
      (2L, "a a a a a a"), // heavy tf of one term
      (3L, "z z"))
      .toDF("doc_id", "text")
    val out = Search.bm25TopK(corpus, Seq("a", "d"), k = 10).collect()
    val byDoc = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byDoc(1L) == 2L && byDoc(2L) == 1L)
    // Scores strictly ordered (desc) with doc_id tiebreak.
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted(Ordering[Double].reverse))
  }

  test("rrfTopK fuses ranks: items in both arms beat single-arm items") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val out = Search.rrfTopK(docs, emb, Seq("spark", "scan", "merge"), 0,
      k = 20, armK = 50).collect()
    assert(out.length == 20)
    // Scores are exactly the rank formula.
    out.foreach { r =>
      val lex = Option(r.get(1)).map(_.asInstanceOf[Int])
      val dense = Option(r.get(2)).map(_.asInstanceOf[Int])
      val want = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        dense.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - want) < 1e-6)
      assert(lex.nonEmpty || dense.nonEmpty)
    }
    // Descending by fused score.
    val s = out.map(_.getDouble(3)).toSeq
    assert(s == s.sorted(Ordering[Double].reverse))
    // A doc ranked in BOTH arms outscores a same-rank single-arm doc:
    // 1/(60+r) + something > 1/(60+r).
    val both = out.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = out.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    if (both.nonEmpty && single.nonEmpty) {
      val minBothRank = both.map(r => math.min(r.getInt(1), r.getInt(2))).min
      single.filter(r =>
        Option(r.get(1)).orElse(Option(r.get(2)))
          .exists(_.asInstanceOf[Int] >= minBothRank))
        .foreach { r =>
          assert(r.getDouble(3) <= both.map(_.getDouble(3)).max)
        }
    }
  }

  /** Hand reference for [[Search.tfIdfTopTerms]]: exact same tokenization
    * (split on single space, drop empties), tf·ln(N/df), top-k per doc by
    * (score desc, term asc), rounded to 6 for presentation. */
  private def tfIdfReference(docs: Seq[(Long, String)], k: Int)
      : Seq[(Long, String, Long, Double)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ", -1).filter(_.nonEmpty).toSeq
    }
    val n = docs.size.toDouble
    val df = toks.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.size }
    toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).toSeq
        .map { case (t, xs) =>
          (id, t, xs.size.toLong, xs.size * math.log(n / df(t)))
        }
        .sortBy { case (_, t, _, s) => (-s, t) }
        .take(k)
        .map { case (id2, t, tf, s) => (id2, t, tf, math.rint(s * 1e6) / 1e6) }
    }.sortBy { case (id, t, _, _) => (id, t) }
  }

  test("tf-idf keywords: hand-computed on a unique corpus (probe bypass)") {
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "durian durian banana"),
      (4L, "elder fig grape honeydew kiwi"))
      .toDF("doc_id", "text")
    val out = Search.tfIdfTopTerms(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(out == tfIdfReference(Seq(
      1L -> "apple banana apple", 2L -> "apple cherry",
      3L -> "durian durian banana", 4L -> "elder fig grape honeydew kiwi"), 3))
    // doc 4 has 5 distinct terms but only TfIdfTopK survive the cut.
    assert(out.count(_._1 == 4L) == Search.TfIdfTopK)
  }

  test("tf-idf keywords: multiplicity-weighted collapse equals the direct form") {
    // 10 byte-identical copies of each text trip the duplication probe, so
    // this runs the COLLAPSED route: df/N must be weighted by member count
    // (df(apple)=20 of N=30), and every copy must inherit its content's
    // top terms. The reference computes the DIRECT (per-document) form —
    // equality proves the collapse is exact, not approximate.
    val base = Seq(
      "apple banana apple", "apple cherry", "durian durian banana")
    val docs = for {
      (t, i) <- base.zipWithIndex
      c <- 0 until 10
    } yield ((i * 10 + c).toLong, t)
    val out = Search.tfIdfTopTerms(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(out == tfIdfReference(docs, 3))
  }

  test("tf-idf: ubiquitous terms score zero and rank below distinctive ones") {
    // 'the' appears in every doc: ln(N/df) = ln(1) = 0 regardless of tf.
    val corpus = Seq(
      (1L, "the the the rare"),
      (2L, "the common"),
      (3L, "the common other"))
      .toDF("doc_id", "text")
    val out = Search.tfIdfTopTerms(corpus, kTerms = 1).collect()
    val top = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) == "rare" && top(2L) == "common")
    assert(out.forall(r => r.getString(1) != "the" || r.getDouble(3) == 0.0))
  }
}
