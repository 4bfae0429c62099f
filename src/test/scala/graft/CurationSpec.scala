package graft

import org.apache.spark.sql.functions.col

import graft.ops.Curation

class CurationSpec extends SparkSpec {

  import spark.implicits._

  private def docs(ids: Range, source: String) =
    ids.map(i => (i.toLong, source, s"text $i")).toDF("doc_id", "source", "text")

  test("mixture sampling: epochs, partial epochs, drops, and the default rate") {
    val d = docs(0 until 100, "up")       // 250% => 2 copies + ids 0..49 a 3rd
      .union(docs(100 until 200, "down")) // 50%  => ids with id%100 < 50 kept once
      .union(docs(200 until 300, "gone")) // 0%   => dropped
      .union(docs(300 until 400, "keep")) // default 100% => exactly one copy
    val out = Curation.mixtureSample(d,
      Map("up" -> 250, "down" -> 50, "gone" -> 0)).collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap

    (0 until 100).foreach { i =>
      val want = if (i % 100 < 50) 3 else 2
      assert(byDoc(i.toLong) == want, s"up doc $i")
    }
    (100 until 200).foreach { i =>
      assert(byDoc.getOrElse(i.toLong, 0) == (if (i % 100 < 50) 1 else 0), s"down doc $i")
    }
    (200 until 300).foreach(i => assert(!byDoc.contains(i.toLong), s"gone doc $i"))
    (300 until 400).foreach(i => assert(byDoc(i.toLong) == 1, s"keep doc $i"))

    // Epoch indices are 1..copies for every admitted doc.
    val epochs = out.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getInt(2)).sorted.toSeq).toMap
    epochs.foreach { case (id, es) => assert(es == (1 to es.size), s"doc $id epochs $es") }
  }

  test("group sample: exact per-source counts, partition-independent, nested ranks") {
    val d = docs(0 until 100, "big").union(docs(100 until 103, "tiny"))
    val out = Curation.groupSample(d, 10).collect()
    val bySource = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySource == Map("big" -> 10, "tiny" -> 3)) // min(k, |source|)

    // Determinism across physical layout: the sample is a pure function of
    // the data, not of partitioning.
    val shuffled = Curation.groupSample(d.repartition(7), 10).collect()
    assert(out.map(_.toSeq).toSet == shuffled.map(_.toSeq).toSet)

    // Nested ranks: the k=5 sample is exactly the rank<=5 prefix of k=10.
    val smaller = Curation.groupSample(d, 5).collect().map(_.toSeq).toSet
    assert(smaller == out.filter(_.getInt(2) <= 5).map(_.toSeq).toSet)
  }

  test("sequence packing: contiguous integer layout per source, straddling allowed") {
    val d = Seq(
      (1L, "s", "a b c"),          // 3 tokens: seq0 [0,3)
      (2L, "s", "d e f g"),        // 4 tokens: seq0 [3,7) — straddles at L=5
      (3L, "s", "h"),              // 1 token:  seq1 [7,8)
      (4L, "t", "x y"))            // own source: restarts at 0
      .toDF("doc_id", "source", "text")
    val out = Curation.packSequences(d, 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      (1L, "s", 3L, 0L, 0L, 0L),
      (2L, "s", 4L, 0L, 3L, 1L),   // starts in seq0 at offset 3, ends in seq1
      (3L, "s", 1L, 1L, 2L, 1L),
      (4L, "t", 2L, 0L, 0L, 0L)))

    // Invariant on the real fixture: within a source, each doc starts
    // exactly where the previous one ended (no token lost or duplicated).
    val docs = Tables.documents(spark, sf)
    val packed = Curation.packSequences(docs, 128).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    packed.values.foreach { rows =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, startSeq, startOff) =>
        assert(startSeq == cum / 128 && startOff == cum % 128)
        cum += n
      }
    }
  }

  test("two-level prefix sum equals the one-window cumulative sum exactly") {
    // The scale-safe running total (range-slice partials + broadcast
    // offsets) must be value-identical to the textbook
    // Window.partitionBy(source) formulation it replaced — on the real
    // fixture AND under adversarial physical layouts.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val documents = Tables.documents(spark, sf)
    val naiveW = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = documents
      .select(col("doc_id"), col("source"),
        size(graft.text.TextOps.tokens(col("text"))).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(naiveW))
      .filter(col("cum_tokens") <= 1000L)
      .orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val twoLevel = Curation.tokenBudgetCap(documents, 1000L)
      .collect().map(_.toSeq).toSeq
    assert(twoLevel == naive, "two-level prefix sum diverged from the one-window answer")
    // Layout independence: a hostile repartition must not change anything.
    val reparted = Curation.tokenBudgetCap(documents.repartition(7), 1000L)
      .collect().map(_.toSeq).toSeq
    assert(reparted == naive, "prefix sum depends on input partitioning")
  }

  test("mixture sampling is deterministic (two runs agree row-for-row)") {
    val d = docs(0 until 50, "s")
    val a = Curation.mixtureSample(d, Map("s" -> 130)).collect().toSeq
    val b = Curation.mixtureSample(d, Map("s" -> 130)).collect().toSeq
    assert(a == b)
    assert(a.size == 50 + 30) // one full epoch + a partial epoch for ids 0..29
  }

  test("weightedSample matches a from-scratch Efraimidis–Spirakis ranking") {
    // Ground truth computed independently of Spark: md5 via MessageDigest,
    // the same 52-bit uniform, key = ln(u)/w, top-k per source.
    val docsDf = Tables.documents(spark, sf)
      .select("doc_id", "source", "n_chars")
    val rows = docsDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._3 > 0)
    def key(docId: Long, w: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4503599627370496.0
      math.log(u) / w
    }
    val k = 7
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.sortBy { case (id, _, w) => (-key(id, w), id) }
        .take(k).zipWithIndex
        .map { case ((id, _, w), i) => (id, src, w, i + 1) }
    }.toSet
    val got = Curation.weightedSample(
        Tables.documents(spark, sf), k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got == expected)
    // Weighting sanity: the selected docs skew long — their mean length
    // beats the corpus mean (a uniform sample would match it).
    val meanAll = rows.map(_._3).sum.toDouble / rows.length
    val meanSel = got.toSeq.map(_._3).sum.toDouble / got.size
    assert(meanSel > meanAll,
      s"weighted sample mean length $meanSel not above corpus mean $meanAll")
  }

  test("training shards: total permutation, contiguous positions, partition-independent") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val shards = Curation.trainingShards(docs, 8)
    val rows = shards.collect().map(r =>
      (r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(rows.length == n.toInt)                  // every doc placed once
    assert(rows.map(_._2).forall(s => s >= 0 && s < 8))
    // Positions within each shard are exactly 0..size-1 (a permutation,
    // no gaps or duplicates).
    rows.groupBy(_._2).foreach { case (shard, ds) =>
      val pos = ds.map(_._3).sorted.toSeq
      assert(pos == (0L until ds.length.toLong),
        s"shard $shard positions not contiguous")
    }
    // No shard is empty and none hogs the corpus (md5 uniformity at n=500).
    val sizes = rows.groupBy(_._2).map(_._2.length)
    assert(sizes.size == 8 && sizes.min > 20)
    // The layout is a pure function of the data: any input partitioning
    // yields the identical assignment.
    val again = Curation.trainingShards(docs.repartition(7), 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("identifier redaction masks the prefix and detects the account layout") {
    import spark.implicits._
    val df = Seq(
      (1L, "Customer#000001234"),
      (2L, "not-an-account"),
      (3L, "Customer#000056789"),
      // Malformed near-miss: masking uses the FULL-id detector pattern, so
      // this is neither detected nor masked (mask/detect cannot disagree).
      (4L, "Customer#12345xyz"))
      .toDF("c_custkey", "c_name")
    val got = df.select(col("c_name"),
        graft.ops.Redaction.maskCustomerId(col("c_name")).as("masked"),
        col("c_name").rlike(graft.ops.Redaction.CustomerIdPattern).as("hit"))
      .collect().map(r => (r.getString(1), r.getBoolean(2))).toSeq
    assert(got == Seq(("Customer#*****1234", true),
      ("not-an-account", false), ("Customer#*****6789", true),
      ("Customer#12345xyz", false)))
    val audit = graft.ops.Redaction.customerIdRedactionAudit(
      Tables.customer(spark, sf)).collect()
    // Every fixture identifier matches the layout, so detection == count,
    // and no unmasked 9-digit identifier survives in the audit sample.
    assert(audit.forall(r => r.getLong(1) == r.getLong(2)))
    assert(audit.forall(r => r.getString(3).startsWith("Customer#*****")))
  }

  test("temperatureMixture: sqrt weights, normalized probabilities, integer quotas") {
    import spark.implicits._
    // source a: 4 tokens -> weight 2; source b: 16 tokens -> weight 4.
    // p = 1/3 and 2/3; budget 600 -> quotas 200 / 400.
    val docs = Seq(
      (1L, "a", "w w w w"),
      (2L, "b", "w w w w w w w w"),
      (3L, "b", "w w w w w w w w"))
      .toDF("doc_id", "source", "text")
    val out = Curation.temperatureMixture(docs, budgetTokens = 600L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))).toMap
    assert(out("a") == ((1L, 4L, 2.0, 0.333333, 200L)))
    assert(out("b") == ((2L, 16L, 4.0, 0.666667, 400L)))
  }

  test("temperatureMixture on testdata: probabilities sum to ~1, quotas to ~budget") {
    val out = Curation.temperatureMixture(
      Tables.documents(spark, sf), budgetTokens = 1000000L).collect()
    val pSum = out.map(_.getDouble(4)).sum
    assert(math.abs(pSum - 1.0) < 1e-4, s"p_sample sums to $pSum")
    val qSum = out.map(_.getLong(5)).sum
    assert(math.abs(qSum - 1000000L) <= out.length, s"quotas sum to $qSum")
    // Temperature flattens: every p_sample sits between uniform and the
    // raw token share's extremes.
    assert(out.forall(_.getDouble(4) > 0))
  }

  /** One document per funnel stage plus one survivor — each row charged to
    * its FIRST failing rule, n_out(k) == n_in(k+1) down the chain. */
  private lazy val funnelDocs = Seq(
    ("fr", "le renard brun rapide saute"),                        // stage 1
    ("en", "too short to pass here"),                             // stage 2
    ("en", (0 until 30).map(i => f"abcdef$i%02d").mkString(" ")), // stage 3 (mean wlen 8)
    ("en", Seq.fill(30)("abcd").mkString(" ")),                   // stage 4 (all dups)
    ("en", ((0 until 32).map(i => f"aa$i%02d") ++
      Seq.fill(8)("aa00")).mkString(" ")),                        // stage 5 (top token 9/40)
    ("en", (0 until 30).map(i => f"bb$i%02d").mkString(" "))      // kept
  ).toDF("lang", "text")

  test("filter funnel: first-fail charging and the n_in/n_out chain") {
    val out = Curation.filterFunnel(funnelDocs).collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == Seq(
      (1, "lang_en", 6L, 1L, 5L),
      (2, "min_words", 5L, 1L, 4L),
      (3, "word_shape", 4L, 1L, 3L),
      (4, "dup_tokens", 3L, 1L, 2L),
      (5, "top_token", 2L, 1L, 1L)))
  }

  test("filter funnel: a stage that rejects nothing still reports its row") {
    val out = Curation.filterFunnel(funnelDocs.filter(col("lang") === "en"))
      .collect()
    assert(out.length == 5)
    val s1 = out.find(_.getInt(0) == 1).get
    assert(s1.getLong(2) == 5L && s1.getLong(3) == 0L && s1.getLong(4) == 5L)
    // The chain still telescopes: survivors = corpus - total rejections.
    assert(out.last.getLong(4) == 5L - out.map(_.getLong(3)).sum)
  }
}
