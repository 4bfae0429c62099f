package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {

  import spark.implicits._

  /** Corpus with one exact dup pair and one near-dup pair. Seven docs so the
    * default 50% document-frequency stop-shingle filter (which on a real
    * corpus only removes boilerplate) does not swallow the dup trio's
    * shared shingles (df=3 ≤ ⌊7·0.5⌋). */
  private lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2L, "the quick brown fox jumps over the lazy cat and runs far away home"),
    (3L, "completely different text about spark query engines and columnar scans"),
    (4L, "another unrelated document mentioning feature stores and lookups only"),
    (5L, "yet more filler prose covering benchmarks partitions shuffles and codegen"),
    (6L, "final padding entry discussing parquet readers vectorization and pruning")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts and keeps min doc_id") {
    val out = Dedup.exactDedup(corpus).collect()
    assert(out.length == 6)
    val dupRow = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupRow.getAs[Long]("doc_id") == 0L)
  }

  test("exact dedup is idempotent") {
    val once = Dedup.exactDedup(corpus)
    val reps = corpus.join(once.select("doc_id"), Seq("doc_id"), "left_semi")
    val twice = Dedup.exactDedup(reps)
    assert(twice.count() == once.count())
  }

  test("incremental dedup: already-seen content dropped, batch copies collapse") {
    val existing = Seq((0L, "seen before"), (2L, "old news")).toDF("doc_id", "text")
    val incoming = Seq(
      (11L, "seen before"),  // already in the corpus => dropped
      (13L, "fresh"),        // genuinely new
      (15L, "fresh"),        // batch copy of 13 => collapses into it
      (17L, "also new"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(existing, incoming).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(out == Seq((13L, 2L), (17L, 1L)))
    // Re-ingesting the admitted batch against the grown corpus yields nothing.
    val grown = existing.union(incoming.filter(col("doc_id").isin(13L, 17L)))
    assert(Dedup.incrementalDedup(grown, incoming).count() == 0)
  }

  test("incremental near-dup: exact copies score 1.0, batch dups fan out, " +
      "tie-break to min existing id, fresh content admitted") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val near = "the quick brown fox jumps over the lazy cat and runs far away home"
    val existing = Seq(
      (0L, base), (2L, base), // exact-dup pair: one content group, rid = 0
      (4L, "completely different text about spark query engines and columnar scans"),
      (6L, "another unrelated document mentioning feature stores and lookups only"),
      (8L, "filler prose covering benchmarks partitions shuffles and codegen today"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (1L, base), // exact re-ingest => jaccard exactly 1.0, matched to min id 0
      (3L, near), // near-dup: 9 of 12 shingles shared => jaccard 0.6
      (5L, near), // batch copy of 3 => identical verdict via the collapse fan-out
      (7L, "totally fresh content nobody has ever written before in any corpus"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDup(existing, incoming, minJaccard = 0.5)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq == Seq(
      (1L, 0L, 12L, 1.0), (3L, 0L, 9L, 0.6), (5L, 0L, 9L, 0.6)))
    // At the default 0.8 cut only the exact re-ingest is rejected.
    val strict = Dedup.incrementalNearDup(existing, incoming).collect()
    assert(strict.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("shingles produce n-grams; short docs collapse to whole text") {
    val sh = corpus.select(Dedup.shingles(col("text"), 3).as("sh")).head().getSeq[String](0)
    assert(sh.head == "the quick brown")
    val tiny = Seq((9L, "two words")).toDF("doc_id", "text")
    val tinySh = tiny.select(Dedup.shingles(col("text"), 3).as("sh")).head().getSeq[String](0)
    assert(tinySh == Seq("two words"))
  }

  test("ngram jaccard finds exact and near dups, not unrelated docs") {
    val rows = Dedup.ngramJaccardPairs(corpus, minJaccard = 0.2).collect()
    val pairs = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a >= 3L || b >= 3L })
    // Identical documents must score exactly 1.0 — the ratio is a true
    // Jaccard of the filtered shingle sets (the round-1 bug scored them 0.16).
    val exact = rows.find(r => r.getAs[Long]("doc_a") == 0L && r.getAs[Long]("doc_b") == 1L).get
    assert(exact.getAs[Double]("jaccard") == 1.0)
  }

  test("ngram jaccard stop-shingle filter drops corpus-wide boilerplate only") {
    // A shingle in >50% of docs carries no dedup signal: docs 7-9 share only
    // the boilerplate prefix present in 5/7 docs, so they must NOT pair.
    val boiler = Seq(
      (0L, "standard header line alpha beta gamma delta"),
      (1L, "standard header line alpha beta gamma delta"),
      (2L, "standard header line epsilon zeta eta theta"),
      (3L, "standard header line iota kappa lambda mu"),
      (4L, "standard header line nu xi omicron pi"),
      (5L, "unrelated filler vocabulary one two three four"),
      (6L, "completely separate content five six seven eight")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(boiler, minJaccard = 0.2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == Set((0L, 1L))) // only the true dup pair survives
  }

  test("native banded minhash pairs equal the MLlib approxSimilarityJoin pair set") {
    // The round-5 native form must not change WHAT q30 finds: same
    // threshold, same fixture => same pair set as the retained MLlib
    // reference implementation (distances differ only in that the native
    // form computes true set Jaccard while MLlib approximates over 2^18
    // HashingTF buckets — pair membership is the contract).
    val docs = Tables.documents(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val native = pairSet(Dedup.minHashPairs(docs, maxDistance = 0.6))
    val mllib = pairSet(Dedup.minHashPairsMLlib(docs, maxDistance = 0.6))
    assert(native == mllib,
      s"native-only: ${(native -- mllib).take(5)}; mllib-only: ${(mllib -- native).take(5)}")
  }

  test("union-find fast path equals the iterative propagation labels") {
    // clusterPairs routes bounded edge sets through driver union-find; the
    // distributed min-propagation path must assign identical labels (it is
    // the over-cap fallback, so divergence would mean scale changes the
    // answer). Pinned on the corpus fixture's minhash pair graph.
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minHashPairs(docs, maxDistance = 0.6)
    def labels(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))).toSet
    val fast = labels(Dedup.clusterPairs(docs.select(col("doc_id")), pairs))
    val iter = labels(Dedup.clusterPairsIterative(docs.select(col("doc_id")), pairs))
    assert(fast == iter)
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
    assert(reps < 7) // at least the 0/1 pair collapsed
  }

  test("cluster propagation handles chains (a-b, b-c => one cluster)") {
    val docs = Seq((10L, "x"), (11L, "x"), (12L, "x")).toDF("doc_id", "text")
    val chain = Seq((10L, 11L), (11L, 12L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterPairs(docs, chain).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out.values.toSet == Set(10L))
  }

  test("cluster propagation converges on a path far longer than the round budget") {
    // A 200-node path has diameter 199: plain min-propagation inside the
    // default 10 rounds would stop at WRONG labels (the round-3 sf0.1
    // oracle caught exactly this); pointer jumping must close it in
    // O(log n) rounds. Worst-case orientation: the min id at one end.
    val n = 200
    val docs = (0 until n).map(i => (i.toLong, "x")).toDF("doc_id", "text")
    val path = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.clusterPairs(docs, path).collect()
      .map(r => r.getAs[Long]("cluster_id")).toSet
    assert(out == Set(0L), s"chain did not collapse to one cluster: $out")
  }

  test("contamination: shared 8-grams are found with the right fraction") {
    // bench doc 100: 9 words = 2 distinct 8-grams. train doc 1 embeds the
    // first 8 words (1 shared gram); train doc 2 is disjoint.
    val benchText = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    val train = Seq(
      (1L, "PRE " + "w1 w2 w3 w4 w5 w6 w7 w8" + " POST"),
      (2L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val out = Dedup.ngramContamination(train, bench, n = 8).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("train_doc") == 1L)
    assert(r.getAs[Long]("bench_doc") == 100L)
    assert(r.getAs[Long]("n_shared") == 1L)
    assert(r.getAs[Double]("contaminated_frac") == 0.5)
  }

  test("single-pass split contamination equals the two-frame form") {
    val docs = Tables.documents(spark, sf)
    val pred = pmod(col("doc_id"), lit(20)) === 0
    val twoFrame = Dedup.ngramContamination(
      docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
      docs.filter(pred)).collect().toSeq
    val onePass = Dedup.ngramContaminationSplit(docs, pred).collect().toSeq
    assert(onePass == twoFrame)
  }

  test("split contamination shingles once at runtime (exchange reuse)") {
    // Plan-shape assertion: it must see the parquet-scan plan, not a
    // CacheManager-substituted InMemoryRelation left behind by another
    // suite (cache substitution changes canonicalization and defeats
    // exchange reuse — observed flake when TextOpsSpec ran first).
    spark.catalog.clearCache()
    val df = Dedup.ngramContaminationSplit(Tables.documents(spark, sf),
      pmod(col("doc_id"), lit(20)) === 0)
    df.collect() // reuse is adaptive — inspect the EXECUTED plan
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "shingle subplan was recomputed per branch instead of reused")
  }

  test("contamination: boilerplate grams above maxDocFreq are ignored") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val train = Seq(
      (1L, boiler + " t1"),
      (2L, boiler + " t2"),
      (3L, boiler + " t3")).toDF("doc_id", "text")
    val bench = Seq((100L, boiler + " e1")).toDF("doc_id", "text")
    // The boilerplate gram sits in all 3 training docs; with maxDocFreq=2
    // it is dropped and nothing is reported.
    assert(Dedup.ngramContamination(train, bench, n = 8, maxDocFreq = 2).count() == 0)
    // With the default cap it is reported for every training doc.
    assert(Dedup.ngramContamination(train, bench, n = 8).count() == 3)
  }

  test("contamination collapse: a duplicated corpus routes collapsed and matches the naive join") {
    // Round-10: q54 was the board's worst scale decade (r103 = 4.0x)
    // because on the 97%-duplicated scale corpora BOTH splits shingled
    // every byte-identical copy. The collapsed route must be row-identical
    // to the naive two-frame join on a fixture with every awkward shape:
    // cross-split identical text (gid_t == gid_b pairs), within-train
    // duplication (df weighted per MEMBER, not per distinct text), and a
    // duplicated text confined to one split.
    val tA = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val tB = "w3 w4 w5 w6 w7 w8 w9 w10 w11 w12" // shares gram [w3..w10] with tA
    val tC = "a b c d e f g h i j"              // disjoint from tA/tB
    val docs = Seq(
      (1L, tA), (2L, tA), (21L, tA), (20L, tA), // tA: 3 train copies + bench 20
      (3L, tB), (23L, tB),                      // tB: train-only duplicate
      (5L, tC), (40L, tC),                      // tC: train 5 + bench 40
      (6L, tC), (26L, tC), (46L, tC), (66L, tC) // more tC train copies
    ).toDF("doc_id", "text")
    val pred = pmod(col("doc_id"), lit(20)) === 0
    // The fixture must actually trip the duplication probe (3 distinct
    // texts over 12 docs), or this test exercises the direct route twice.
    assert(graft.text.TextOps.duplicationHeavy(docs, Seq("text")),
      "fixture not duplication-heavy; collapse route untested")
    val naive = Dedup.ngramContamination(
      docs.filter(pmod(col("doc_id"), lit(20)) =!= 0),
      docs.filter(pred)).collect().toSeq
    val collapsed = Dedup.ngramContaminationSplit(docs, pred).collect().toSeq
    assert(collapsed == naive)
    // Spot-check the shapes: bench 20 (tA) collides with every tA train
    // copy at full overlap (3 grams of 3) and with both tB copies on the
    // single shared gram; bench 40 (tC) with all five tC train copies.
    val m = collapsed.map(r => (r.getAs[Long]("train_doc"),
      r.getAs[Long]("bench_doc")) -> (r.getAs[Long]("n_shared"),
      r.getAs[Double]("contaminated_frac"))).toMap
    assert(m((1L, 20L)) == ((3L, 1.0)))
    assert(m((21L, 20L)) == ((3L, 1.0)))
    assert(m((3L, 20L)) == ((1L, 0.333333)))
    assert(m((23L, 20L)) == ((1L, 0.333333)))
    assert(m((5L, 40L)) == ((3L, 1.0)))
    assert(m((66L, 40L)) == ((3L, 1.0)))
    assert(m.size == naive.size && m.size == 3 + 2 + 5)
  }

  test("canonicalizeClusters keeps the longest member, ties to min id") {
    import spark.implicits._
    // One near-dup cluster {1,2,3} (3 shares 2's text verbatim) among
    // distinct fillers (enough corpus that the shared shingles stay under
    // the 50% df guard). Lengths 20, 90, 90: docs 2 and 3 tie on n_chars
    // -> doc 2 (smaller id) is kept.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val fillers = (11L to 17L).map(i =>
      (i, s"f$i g$i h$i k$i m$i n$i p$i r$i", 40L))
    val docs = (Seq(
      (1L, a + " iota", 20L),
      (2L, a + " kappa", 90L),
      (3L, a + " kappa", 90L)) ++ fillers)
      .toDF("doc_id", "text", "n_chars")
    val out = Dedup.canonicalizeClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.head == ((1L, 2L, 3L, 90L, 110L)))
    assert(out.tail.toSeq == fillers.map { case (i, _, c) => (i, i, 1L, c, 0L) })
  }

  test("canonicalizeClusters equals the naive closure of ngramJaccardPairs") {
    // The adversarial duplicated corpus: replicate sf0.001 documents 3x
    // byte-identical (distinct ids). The rep-graph path must reproduce the
    // aggregate of clusterPairs over the FULL expanded pair set.
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("n_chars"))
    val dup = base
      .unionByName(base.withColumn("doc_id", col("doc_id") + 100000L))
      .unionByName(base.withColumn("doc_id", col("doc_id") + 200000L))
    val fast = Dedup.canonicalizeClusters(dup)
    val naive = {
      val pairs = Dedup.ngramJaccardPairs(dup).select("doc_a", "doc_b")
      val labels = Dedup.clusterPairs(dup.select("doc_id"), pairs)
        .select(col("doc_id"), col("cluster_id"))
      dup.select(col("doc_id"), col("n_chars")).join(labels, Seq("doc_id"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"), sum(col("n_chars")).as("__total"),
          min(struct((-col("n_chars")).as("__neg"), col("doc_id").as("__id")))
            .as("__best"))
        .select(col("cluster_id"), col("__best.__id").as("kept_doc_id"),
          col("n_members"), (-col("__best.__neg")).as("kept_chars"),
          (col("__total") + col("__best.__neg")).as("chars_dropped"))
    }
    assert(fast.count() == naive.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // The duplicated fixture must actually exercise multi-member clusters.
    assert(fast.filter(col("n_members") >= 3).count() > 0)
  }

  test("canonicalizeClusters: all-stop-shingle docs stay singletons (empty-set carve-out)") {
    import spark.implicits._
    // 'x' is the whole shingle of four short docs -> df 4 > 50% of 6 ->
    // filtered everywhere -> those docs pair with nothing, not even their
    // byte-identical copies.
    val docs = Seq(
      (1L, "x", 1L), (2L, "x", 1L), (3L, "x", 1L), (4L, "x", 1L),
      (5L, "p q r s t u v w", 15L), (6L, "p q r s t u v w", 15L))
      .toDF("doc_id", "text", "n_chars")
    val out = Dedup.canonicalizeClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 4L, 1L),
      (5L, 5L, 2L)))
  }

  test("fuzzyNameMatch blocks on the last token and expands multiplicities") {
    import spark.implicits._
    // "red ring" x2 and "rad ring" x1 share the block and sit at distance
    // 1 -> one pair with n_row_pairs 2. "blue bolt" is alone in its block;
    // "red wing" shares no block with the rings despite distance 2.
    val part = Seq(
      (1L, "red ring"), (2L, "red ring"), (3L, "rad ring"),
      (4L, "blue bolt"), (5L, "red wing"),
      (6L, "ride ring")) // distance 2 from both rings, same block
      .toDF("p_partkey", "p_name")
    val out = Dedup.fuzzyNameMatch(part).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("rad ring", "red ring", 1, 1L, 2L, 2L),
      ("rad ring", "ride ring", 2, 1L, 1L, 1L),
      ("red ring", "ride ring", 2, 2L, 1L, 2L)))
    // Distance cut genuinely bites: maxDist=1 drops the distance-2
    // "ride ring" pairs that maxDist=3 keeps.
    val tight = Dedup.fuzzyNameMatch(part, maxDist = 1).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(tight == Set(("rad ring", "red ring")))
    // maxDist=0 is rejected: a zero threshold is exact dedup's job.
    assertThrows[IllegalArgumentException] {
      Dedup.fuzzyNameMatch(part, maxDist = 0)
    }
  }
}
