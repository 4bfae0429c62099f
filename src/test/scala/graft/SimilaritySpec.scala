package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.sim.Similarity

class SimilaritySpec extends SparkSpec with BeforeAndAfterAll {

  private lazy val embeddings = Tables.embeddings(spark, sf).cache()

  // Unpersist so the shared session's CacheManager never substitutes this
  // cache into later suites' plans (plan-shape tests assume parquet scans).
  override def afterAll(): Unit = { embeddings.unpersist(); super.afterAll() }

  /** Driver-side exact cosine for cross-checking the distributed op. */
  private def localTopK(k: Int): Seq[(Long, Double)] = {
    val rows = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val q = rows.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.filter(_._1 != 0L).map { case (id, v) => id -> cos(v, q) }
      .sortBy { case (id, s) => (-math.rint(s * 1e6) / 1e6, id) }.take(k).toSeq
      .map { case (id, s) => id -> math.rint(s * 1e6) / 1e6 }
  }

  test("brute-force cosine top-k matches a driver-side computation") {
    val got = Similarity.bruteForceTopK(embeddings, 0, 10).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine_sim"))).toSeq
    val want = localTopK(10)
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) => assert(math.abs(g - w) < 1e-9) }
  }

  test("cosine of a vector with itself is 1") {
    val self = embeddings.limit(5)
      .select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    self.foreach(c => assert(math.abs(c - 1.0) < 1e-9))
  }

  test("LSH top-k returns k well-formed rows with decent recall") {
    val exact = localTopK(10).map(_._1).toSet
    val approx = Similarity.lshTopK(embeddings, 0, 10).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(approx.size == 10)
    // Random-projection LSH on 64-dim unit vectors: expect meaningful overlap.
    assert((exact & approx).size >= 3, s"recall too low: ${(exact & approx).size}/10")
  }

  test("IVF probes a subset of cells and finds near-exact neighbors") {
    val index = Similarity.buildIvf(embeddings, nlist = 8)
    assert(index.centroids.length == 8)
    val got = Similarity.ivfTopK(index, 0, 10, nprobe = 8).collect() // nprobe=nlist => exact
    val want = localTopK(10).map(_._1)
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == want)
    val partial = Similarity.ivfTopK(index, 0, 10, nprobe = 2).collect()
    assert(partial.length == 10)
  }

  test("IVF index save/load round-trips: same probes, partition-pruned scan") {
    val embeddings = Tables.embeddings(spark, sf)
    val index = Similarity.buildIvf(embeddings, nlist = 8)
    val path = tempDir("graft_ivf")
    Similarity.saveIvf(index, path)
    val loaded = Similarity.loadIvf(spark, path)
    // Same centroids, same probe results, across the persistence boundary.
    assert(loaded.centroids.map(_._1).toSeq == index.centroids.map(_._1).toSeq)
    assert(loaded.centroids.zip(index.centroids).forall {
      case ((_, a), (_, b)) => a.sameElements(b) })
    val before = Similarity.ivfTopK(index, 0, 10, nprobe = 3).collect().toSeq
    val after = Similarity.ivfTopK(loaded, 0, 10, nprobe = 3).collect().toSeq
    assert(after == before)
    // The on-disk layout is partitioned by cell, so a probe's cell filter
    // prunes partitions at plan time instead of scanning the corpus.
    val probePlan = loaded.assigned
      .filter(org.apache.spark.sql.functions.col("cell").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("PartitionFilters") && probePlan.contains("cell"),
      s"cell filter did not become a partition filter:\n$probePlan")
    index.unpersist()
  }

  test("IVF admission: delta == fresh assignment under the same quantizer; combined index exact at nprobe=nlist") {
    // Round-10 ask #3: a corpus append must cost O(batch) — assign the new
    // vectors to the EXISTING quantizer's cells and land a delta segment —
    // not a whole-index rebuild. Pins: (a) admitted cells equal an
    // INDEPENDENT driver-side argmin under the base quantizer; (b) same
    // segment re-admitted is idempotent (overwrite, not append); (c) the
    // combined base+delta index at nprobe = nlist is EXACT over the full
    // corpus, so admission lost no recall (the q110 floor a fortiori).
    val base = embeddings.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val batch = embeddings.filter(pmod(col("vec_id"), lit(10)) === 0)
    val idx = Similarity.buildIvf(base, nlist = 8)
    val path = tempDir("graft_ivf_admit")
    Similarity.saveIvf(idx, path)
    idx.unpersist()
    Similarity.ivfAdmit(path, batch, segment = "b0")
    val merged = Similarity.loadIvfWithDeltas(spark, path)
    assert(merged.assigned.count() == embeddings.count(), "rows lost or duplicated")
    val cents = merged.centroids
    merged.assigned.join(batch.select("vec_id"), "vec_id")
      .select("vec_id", "cell", "embedding").collect()
      .foreach { r =>
        val v = r.getSeq[Float](2).map(_.toDouble).toArray
        val want = cents.minBy { case (i, c) =>
          (c.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum, i) }._1
        assert(r.getInt(1) == want,
          s"vec ${r.getLong(0)} admitted to cell ${r.getInt(1)}, argmin is $want")
      }
    val exact = Similarity.bruteForceTopK(embeddings, 0, 10).collect()
      .map(_.getAs[Long]("vec_id")).toSeq
    val admitted = Similarity.ivfKnnJoin(merged,
        embeddings.filter(col("vec_id") === 0), 10, nprobe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(admitted == exact,
      s"combined index at nprobe=nlist diverged from exact: $admitted vs $exact")
    // Idempotence last: the overwrite replaces the delta's files, so any
    // frame planned over the OLD listing (merged above) is dead after it —
    // exactly why the production query re-loads per call.
    Similarity.ivfAdmit(path, batch, segment = "b0")
    assert(Similarity.loadIvfWithDeltas(spark, path).assigned.count() ==
      embeddings.count(), "re-admitting the same segment duplicated rows")

    // Compaction (q163): base + deltas rewritten into a FRESH generation —
    // content-identical, delta-free, source untouched; probes equal.
    val out = tempDir("graft_ivf_compact")
    Similarity.ivfCompactTo(spark, path, out)
    val compacted = Similarity.loadIvf(spark, out)
    def keyed(ix: Similarity.IvfIndex) = ix.assigned
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val fresh = Similarity.loadIvfWithDeltas(spark, path)
    assert(keyed(compacted) == keyed(fresh), "compaction changed the content")
    assert(compacted.centroids.zip(fresh.centroids).forall {
      case ((i, a), (j, b)) => i == j && a.sameElements(b) },
      "compaction changed the quantizer")
    val outFs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!outFs.listStatus(new org.apache.hadoop.fs.Path(out))
      .exists(_.getPath.getName.startsWith("delta_")),
      "compacted generation still has delta segments")
    assert(outFs.exists(new org.apache.hadoop.fs.Path(s"$path/delta_b0")),
      "compaction destroyed the SOURCE generation's delta")
    val probeCompacted = Similarity.ivfKnnJoin(compacted,
        embeddings.filter(col("vec_id") === 0), 10, nprobe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(probeCompacted == exact, "compacted probe diverged from exact")
  }

  test("PQ: codes are well-formed; full-candidate search equals exact top-k; pruned recall is high") {
    val embeddings = Tables.embeddings(spark, sf)
    val cb = Similarity.pqTrain(embeddings, m = 8, k = 16)
    assert(cb.dsub == 8)
    val encoded = Similarity.pqEncode(embeddings, cb).cache()
    try {
      val codes = encoded.select("codes").collect().map(_.getSeq[Int](0))
      assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
      val n = encoded.count().toInt

      val exact = Similarity.bruteForceTopK(embeddings, 0, 10).collect()
        .map(_.getLong(0)).toSeq
      // candidates >= corpus: the rerank sees everything -> provably exact.
      val full = Similarity.pqTopK(encoded, cb, 0, 10, candidates = n).collect()
        .map(_.getLong(0)).toSeq
      assert(full == exact)
      // Realistic pruning: 64 of ~500 candidates — measured recall, not
      // assumed. The ADC table is a 128-entry LUT, so a weak codebook
      // would show up here immediately.
      val pruned = Similarity.pqTopK(encoded, cb, 0, 10, candidates = 64).collect()
        .map(_.getLong(0)).toSet
      val recall = exact.count(pruned.contains) / 10.0
      assert(recall >= 0.7, s"PQ recall@10 too low: $recall")
    } finally { encoded.unpersist(); () }
  }

  test("PQ training is deterministic and rejects indivisible dimensions") {
    val embeddings = Tables.embeddings(spark, sf)
    val a = Similarity.pqTrain(embeddings, m = 4, k = 8)
    val b = Similarity.pqTrain(embeddings, m = 4, k = 8)
    assert(a.books.flatten.flatten.toSeq == b.books.flatten.flatten.toSeq)
    val err = intercept[IllegalArgumentException] {
      Similarity.pqTrain(embeddings, m = 7)
    }
    assert(err.getMessage.contains("not divisible"))
  }

  test("knn join returns the brute-force top-k for every query row") {
    val queries = embeddings.filter(col("vec_id") < 3)
    val got = Similarity.knnJoin(embeddings, queries, 5).collect()
      .groupBy(_.getAs[Long]("q_vec_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("knn_rank")).map(_.getAs[Long]("vec_id")).toSeq)
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    // Per query, the k-NN join must agree with the single-query baseline.
    (0L to 2L).foreach { qid =>
      val single = Similarity.bruteForceTopK(embeddings, qid, 5).collect()
        .map(_.getAs[Long]("vec_id")).toSeq
      assert(got(qid) == single, s"query $qid: ${got(qid)} != $single")
    }
  }

  /** Driver-side exact all-pairs ground truth for the near-dup ops. */
  private def localPairs(minCosine: Double): Set[(Long, Long)] = {
    val rows = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    (for {
      (ia, va) <- rows; (ib, vb) <- rows
      if ia < ib && cos(va, vb) >= minCosine
    } yield (ia, ib)).toSet
  }

  test("ivf knn join: exact at nprobe=nlist, decent recall when pruning cells") {
    val index = Similarity.buildIvf(embeddings, nlist = 8)
    val queries = embeddings.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_vec_id"), r.getAs[Long]("vec_id"))).toSet
    val exact = pairs(Similarity.knnJoin(embeddings, queries, 10))
    // Probing every cell scans every candidate => identical to exact kNN.
    val full = Similarity.ivfKnnJoin(index, queries, 10, nprobe = 8)
    assert(pairs(full) == exact)
    assert(full.columns.toSeq ==
      Seq("q_vec_id", "vec_id", "label", "cosine_sim", "knn_rank"))
    // Pruned probing trades recall for touching nprobe/nlist of the corpus.
    val pruned = pairs(Similarity.ivfKnnJoin(index, queries, 10, nprobe = 3))
    val recall = (pruned & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"ivf knn recall $recall too low at nprobe=3")
    index.unpersist()
  }

  test("exact near-dup pairs equal the driver-side all-pairs ground truth") {
    val got = Similarity.cosineNearDupPairs(embeddings, minCosine = 0.3).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(got == localPairs(0.3)) // 100% recall AND precision, by construction
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val pairs = Similarity.cosineNearDupPairs(embeddings, minCosine = 0.5).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      // Filter applies to the unrounded value; the emitted value is rounded
      // to 6 digits, so it can sit up to 5e-7 below the threshold.
      assert(r.getAs[Double]("cosine_sim") >= 0.5 - 5e-7)
    }
  }

  test("two-stage quantized retrieval equals the exact brute-force top-k") {
    val exact = Similarity.bruteForceTopK(embeddings, 0, 20).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine_sim"))).toSeq
    val staged = Similarity.quantizedTwoStageTopK(embeddings, 0, 20).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine_sim"))).toSeq
    assert(staged == exact)
    // Degenerate slack: rerank == k still returns k rows (pure coarse order).
    assert(Similarity.quantizedTwoStageTopK(embeddings, 0, 5, rerank = 5).count() == 5)
  }

  test("label centroids match the driver-side per-label mean") {
    val rows = embeddings.select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val want = rows.groupBy(_._1).map { case (label, vs) =>
      val n = vs.length
      val mean = vs.map(_._2).transpose.map(c => c.sum / n)
      label -> (n.toLong, mean)
    }
    val got = Similarity.labelCentroids(embeddings).collect()
    assert(got.length == want.size * rows.head._2.length)
    got.foreach { r =>
      val (label, n, pos, c) =
        (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3))
      val (wantN, wantMean) = want(label)
      assert(n == wantN)
      assert(pos >= 1 && pos <= wantMean.length)
      // Summarizer's online mean vs the naive sum/n agree well inside the
      // emitted 4-digit rounding.
      assert(math.abs(c - wantMean(pos - 1)) <= 1e-4,
        s"label $label pos $pos: $c vs ${wantMean(pos - 1)}")
    }
  }

  test("int8 quantization: code shape, per-component error bound, cosine fidelity") {
    val rows = Similarity.dequantize(Similarity.quantize(embeddings))
      .select("embedding", "q_scale", "q_embedding", "deq_embedding").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val orig = r.getSeq[Float](0).map(_.toDouble)
      val scale = r.getDouble(1)
      val codes = r.getSeq[Byte](2)
      val rec = r.getSeq[Double](3)
      assert(codes.length == orig.length && rec.length == orig.length)
      // Symmetric quantization: |x - deq(x)| <= scale/2 per component.
      orig.zip(rec).foreach { case (o, x) => assert(math.abs(o - x) <= scale / 2 + 1e-9) }
      val dot = orig.zip(rec).map { case (a, b) => a * b }.sum
      val cos = dot / (math.sqrt(orig.map(x => x * x).sum) * math.sqrt(rec.map(x => x * x).sum))
      assert(cos > 0.999, s"cosine fidelity $cos below 0.999")
    }
  }

  test("banded near-dup join finds all planted near-duplicates, none spurious") {
    import spark.implicits._
    // Plant near-dups: clone 20 base vectors with a tiny deterministic
    // perturbation (cosine vs original ≈ 0.9998, far above 0.9).
    val base = embeddings.select("vec_id", "embedding").limit(20).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val rng = new scala.util.Random(7)
    val planted = base.map { case (id, v) =>
      (id + 100000L, v.map(x => x + rng.nextFloat() * 0.01f - 0.005f))
    }
    val corpus = (base ++ planted).toSeq
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDupPairsBanded(corpus, minCosine = 0.9).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val want = base.map { case (id, _) => (id, id + 100000L) }.toSet
    // Recall must cover every plant; precision is exact by construction
    // (candidates pass the exact cosine >= 0.9 filter before being emitted).
    assert((want -- got).isEmpty, s"banded join missed planted pairs: ${want -- got}")
  }

  test("PQ trained on a corpus smaller than k still encodes and searches") {
    // Lloyd.fit returns min(k, |sample|) centroids; the codebooks must
    // record that actual size or encode/search index past the books.
    import spark.implicits._
    val tiny = (0L until 5L).map { i =>
      (i, Array.tabulate(8)(j => (i + j).toFloat / 10f), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val cb = Similarity.pqTrain(tiny, m = 8, k = 16)
    assert(cb.k == 5, s"codebook k should equal the 5-row sample, got ${cb.k}")
    val enc = Similarity.pqEncode(tiny, cb)
    val out = Similarity.pqTopK(enc, cb, 0, 3).collect()
    assert(out.length == 3 && out.forall(_.getLong(0) != 0L))
  }

  test("memoized IVF and PQ indexes rebuild when the corpus at a path is rewritten") {
    // Round-3 defect: SparkEntry's index caches keyed on the dir path only,
    // so rewriting the corpus at the same path within one session served a
    // stale index. The fingerprint key must catch the rewrite.
    val dir = tempDir("graft_fp_")
    val emb = Tables.embeddings(spark, sf)
    def neighborIds(q: String) =
      SparkEntry.queries(q)(spark, dir).select("vec_id").collect().map(_.getLong(0)).toSet

    // Corpus A: vec_ids [0, 60). Every neighbor of query vec 0 is < 60.
    emb.filter(col("vec_id") < 60).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val ivfA = neighborIds("q34_ivf_topk")
    val pqA = neighborIds("q92_pq_topk")
    assert(ivfA.nonEmpty && ivfA.forall(id => id > 0 && id < 60))
    assert(pqA.nonEmpty && pqA.forall(_ < 60))

    // Corpus B at the SAME path: vec 0 plus vec_ids [60, 120). A stale
    // index would keep returning ids < 60; a fresh one cannot.
    emb.filter(col("vec_id") === 0 || (col("vec_id") >= 60 && col("vec_id") < 120))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ivfB = neighborIds("q34_ivf_topk")
    val pqB = neighborIds("q92_pq_topk")
    assert(ivfB.nonEmpty && ivfB.forall(id => id >= 60 && id < 120),
      s"stale IVF index served after corpus rewrite: $ivfB")
    assert(pqB.nonEmpty && pqB.forall(id => id == 0 || (id >= 60 && id < 120)),
      s"stale PQ index served after corpus rewrite: $pqB")
  }

  test("q110 reports recall@20 for every ANN index, above the floor") {
    // Per-round recall observability (round-4 verdict item 7): the query
    // itself computes recall vs q29's exact top-k; this pins a floor so an
    // index regression fails the suite, not just dents a bench number.
    val out = SparkEntry.queries("q110_ann_recall")(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r.getAs[Double]("recall_at_k")).toMap
    assert(out.keySet == Set("ivf", "lsh", "pq"), s"methods: ${out.keySet}")
    out.foreach { case (m, r) =>
      assert(r >= 0.5, s"$m recall@20 = $r below the 0.5 floor")
    }
  }

  test("duplication-aware embeddingClusters equals the naive pair-graph clustering") {
    // Adversarial frame: every vector duplicated (shifted ids), so the
    // naive pair graph gains a 2-clique per vector plus 4x the cross
    // edges — the collapse must reproduce its components exactly.
    val emb = Tables.embeddings(spark, sf)
    val dup = emb.unionByName(
      emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
    val naivePairs = Similarity.cosineNearDupPairs(dup, 0.4)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val naive = graft.dedup.Dedup.clusterPairs(
        dup.select(col("vec_id").as("doc_id")), naivePairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id"), col("is_representative"))
    val aware = Similarity.embeddingClusters(dup, 0.4)
    assert(aware.count() == naive.count())
    assert(aware.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(aware).count() == 0)
  }

  test("duplication-aware near-dup pairs equal the naive all-pairs scan, clique included") {
    // Adversarial frame: every vector appears 3x (two shifted copies), so
    // the output gains C(3,2) within-clique pairs per vector and 9x the
    // cross pairs - the collapse+expand must reproduce the naive
    // broadcast scan's rows EXACTLY (same ids, same rounded cosines).
    val emb = Tables.embeddings(spark, sf).limit(200)
    val dup = emb
      .unionByName(emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
      .unionByName(emb.withColumn("vec_id", col("vec_id") + lit(2000000L)))
    val naive = Similarity.cosineNearDupPairsExact(dup, 0.4)
    val aware = Similarity.cosineNearDupPairs(dup, 0.4)
    assert(aware.count() == naive.count())
    assert(aware.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(aware).count() == 0)
    // Within-clique pairs really are present: each of the 200 vectors
    // forms a 3-clique (cosine(v, v) = 1 for every non-zero vector here).
    assert(aware.filter(col("cosine_sim") >= 0.999999).count() >= 3L * 200)
  }

  test("duplication-aware collapse composed with the BANDED branch equals naive banded") {
    // Same adversarial 3x fixture, but at a threshold >= BandedThreshold so
    // cosineNearDupPairs routes collapse+expand through the banded LSH
    // self-join. Equality vs banded-run-naively holds DETERMINISTICALLY:
    // the band keys are pure functions of the vector values, so every copy
    // collides exactly where its representative does, and the exact cosine
    // filter at the tail makes precision identical on both paths.
    val emb = Tables.embeddings(spark, sf).limit(200)
    val dup = emb
      .unionByName(emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
      .unionByName(emb.withColumn("vec_id", col("vec_id") + lit(2000000L)))
    val tau = Similarity.BandedThreshold // 0.8 — the routing boundary itself
    val naive = Similarity.cosineNearDupPairsBanded(dup, tau)
    val aware = Similarity.cosineNearDupPairs(dup, tau)
    assert(aware.count() == naive.count())
    assert(aware.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(aware).count() == 0)
    // The clique floor again: 3 within-pairs per duplicated vector.
    assert(aware.filter(col("cosine_sim") >= 0.999999).count() >= 3L * 200)
  }

  /** The split every lifecycle spec below uses: the 90% "pre-existing"
    * base corpus and the 10% append batch (the q162 framing). */
  private def baseAndBatch = (
    embeddings.filter(pmod(col("vec_id"), lit(10)) =!= 0),
    embeddings.filter(pmod(col("vec_id"), lit(10)) === 0))

  private def keyedAssigned(ix: Similarity.IvfIndex): Seq[(Long, Int)] =
    ix.assigned.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq

  test("segment publish is atomic: loads see the old complete delta or none, never a torn one") {
    // Round-11 ask #5: parquet overwrite is delete-then-write, so a crash
    // mid-admission used to leave a torn segment until the next run
    // healed it. Admission now writes to a hidden staging dir and
    // publishes with ONE rename.
    val (base, batch) = baseAndBatch
    val idx = Similarity.buildIvf(base, nlist = 8)
    val path = tempDir("graft_ivf_atomic")
    Similarity.saveIvf(idx, path)
    idx.unpersist()
    Similarity.ivfAdmit(path, batch, "b0")
    val full = keyedAssigned(Similarity.loadIvfWithDeltas(spark, path))
    assert(full.size == embeddings.count())
    // Crash MID-overwrite of the same segment: the staging dir holds torn
    // bytes, the published delta is still the OLD complete one.
    val staging = new java.io.File(path, ".staging_delta_b0/assigned")
    assert(staging.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(staging, "part-00000.parquet").toPath,
      Array[Byte](0x50, 0x41, 0x52))
    assert(keyedAssigned(Similarity.loadIvfWithDeltas(spark, path)) == full,
      "a torn staging dir leaked into the served index")
    // A fresh admission heals: staging wiped, segment republished whole.
    Similarity.ivfAdmit(path, batch, "b0")
    assert(!new java.io.File(path, ".staging_delta_b0").exists())
    assert(keyedAssigned(Similarity.loadIvfWithDeltas(spark, path)) == full)
    // A segment removed OUT-OF-BAND (not via publish — e.g. manual
    // cleanup) degrades to base-only: the load never invents rows. The
    // publish path itself no longer has a no-segment state — its
    // rename-aside swap is pinned by the mid-swap crash test below.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/delta_b0"), true)
    assert(keyedAssigned(Similarity.loadIvfWithDeltas(spark, path)).size ==
      base.count(), "a missing segment did not degrade to base-only")
  }

  test("re-publication crash mid-swap serves the parked old segment; tombstones never resurrect") {
    // Round-12 advice: the old delete-then-rename republish had a crash
    // state with NO segment — benign for deltas, but a tombstone's
    // absence re-serves deleted vectors. publishSegment now parks the
    // old segment at `.old_<name>` and listSegments serves the parked
    // copy whenever the published name is absent, so every crash point
    // leaves readers on a complete OLD segment.
    val (base, batch) = baseAndBatch
    val idx = Similarity.buildIvf(base, nlist = 8)
    val path = tempDir("graft_ivf_swap")
    Similarity.saveIvf(idx, path)
    idx.unpersist()
    Similarity.ivfAdmit(path, batch, "b0")
    val full = keyedAssigned(Similarity.loadIvfWithDeltas(spark, path))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def park(name: String): Unit =
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/$name"),
        new org.apache.hadoop.fs.Path(s"$path/.old_$name")))
    // Crash state between the two renames: old parked, nothing published.
    park("delta_b0")
    assert(keyedAssigned(Similarity.loadIvfWithDeltas(spark, path)) == full,
      "mid-swap crash state did not serve the parked old delta")
    // Re-publication heals: parked copy retired, fresh segment served.
    Similarity.ivfAdmit(path, batch, "b0")
    assert(!new java.io.File(path, ".old_delta_b0").exists(),
      "healing republish left the parked copy behind")
    assert(keyedAssigned(Similarity.loadIvfWithDeltas(spark, path)) == full)
    // The deletion-safety asymmetry the advice flagged: a tombstone
    // caught mid-swap must KEEP masking its ids.
    val dels = embeddings.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select(col("vec_id"))
    val delIds = dels.collect().map(_.getLong(0)).toSet
    Similarity.ivfDelete(path, dels, "t0")
    val masked = full.filterNot(r => delIds(r._1))
    assert(keyedAssigned(Similarity.loadIvfWithDeltas(spark, path)) == masked)
    park("tomb_t0")
    assert(keyedAssigned(Similarity.loadIvfWithDeltas(spark, path)) == masked,
      "a parked tombstone stopped masking — deleted ids resurrected mid-swap")
    // Crash-after-swap state (published AND parked both present): the
    // published name wins — no double-count, no stale rows.
    Similarity.ivfDelete(path, dels, "t0")
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$path/tomb_t0")
    val cpy = new org.apache.hadoop.fs.Path(s"$path/.old_tomb_t0")
    org.apache.hadoop.fs.FileUtil.copy(src.getFileSystem(conf), src,
      cpy.getFileSystem(conf), cpy, false, true, conf)
    assert(keyedAssigned(Similarity.loadIvfWithDeltas(spark, path)) == masked,
      "a leftover parked copy next to its published segment changed the serve")
  }

  test("streaming IVF admission settles to the one-shot admission under any carving") {
    // Round-11 ask #2: per-micro-batch ivfAdmit against the persisted
    // base, one delta segment per batch id into an EXTERNAL root (base
    // generation immutable). A batch's segment depends only on the fixed
    // quantizer, so the settled union equals the one-shot admission
    // whether the corpus arrives as one trigger or one file at a time.
    val (base, batch) = baseAndBatch
    val idx = Similarity.buildIvf(base, nlist = 8)
    val path = tempDir("graft_ivf_stream_base")
    Similarity.saveIvf(idx, path)
    idx.unpersist()
    val oneRoot = tempDir("graft_ivf_oneshot")
    Similarity.ivfAdmit(path, batch, "b0", deltaRoot = Some(oneRoot))
    def served(root: String): Seq[(Long, Int)] =
      keyedAssigned(Similarity.loadIvfWithDeltas(spark, path, Some(Seq(root))))
    val oneShot = served(oneRoot)
    // Carve the corpus into three embeddings_<i>.parquet files.
    val dir = tempDir("graft_emb_stream")
    (0 until 3).foreach { i =>
      val sliceDir = s"$dir/slice_$i"
      embeddings.filter(pmod(col("vec_id"), lit(3)) === i)
        .coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/embeddings_$i.parquet"))
    }
    val allAtOnce = tempDir("graft_ivf_stream_a")
    graft.streaming.EmbeddingStreams.ivfAdmissionStream(spark, dir, path, allAtOnce)
    assert(served(allAtOnce) == oneShot, "single-trigger stream diverged")
    val perFile = tempDir("graft_ivf_stream_b")
    graft.streaming.EmbeddingStreams.ivfAdmissionStream(spark, dir, path,
      perFile, maxFilesPerTrigger = Some(1))
    assert(served(perFile) == oneShot, "per-file carving diverged")
    // The carved run really exercised multi-segment union.
    assert(new java.io.File(perFile).listFiles()
      .count(_.getName.startsWith("delta_")) >= 2,
      "per-file run did not produce multiple delta segments")
    // Base generation untouched by either stream: its own layout still
    // serves exactly the base rows.
    assert(keyedAssigned(Similarity.loadIvfWithDeltas(spark, path)).size ==
      base.count(), "streaming admission mutated the base generation")
  }

  test("ANN deletion: tombstones mask probes at once, dominate re-admission, and compaction reclaims them") {
    // Round-11 ask #3. Pins: (a) serving after ivfDelete equals the index
    // content minus the deleted ids; (b) the probe over the tombstoned
    // index equals the probe over the COMPACTED index (rebuilt without
    // the deleted rows in one pass, same quantizer) — serve-time masking
    // and physical reclaim agree; (c) the compacted generation carries no
    // delta and no tombstone dirs and physically lacks the deleted rows;
    // (d) tombstones dominate a LATER re-admission of the same id (the
    // set-union contract: resurrecting an id requires compacting first).
    val (base, batch) = baseAndBatch
    val idx = Similarity.buildIvf(base, nlist = 8)
    val path = tempDir("graft_ivf_delete")
    Similarity.saveIvf(idx, path)
    idx.unpersist()
    Similarity.ivfAdmit(path, batch, "b0")
    val before = keyedAssigned(Similarity.loadIvfWithDeltas(spark, path))
    val dels = embeddings.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select(col("vec_id"))
    val delIds = dels.collect().map(_.getLong(0)).toSet
    assert(delIds.nonEmpty && delIds.exists(_ % 10 == 0) &&
      delIds.exists(_ % 10 != 0), "fixture must hit base AND delta rows")
    Similarity.ivfDelete(path, dels, "t0")
    val after = Similarity.loadIvfWithDeltas(spark, path)
    assert(keyedAssigned(after) == before.filterNot(r => delIds(r._1)),
      "served index != content minus deleted ids")
    val probeDeleted = Similarity.ivfKnnJoin(after,
        embeddings.filter(col("vec_id") === 0), 10, nprobe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(probeDeleted.forall(!delIds(_)), "a deleted id surfaced in a probe")
    val out = tempDir("graft_ivf_reclaim")
    Similarity.ivfCompactTo(spark, path, out)
    val compacted = Similarity.loadIvf(spark, out)
    assert(keyedAssigned(compacted) == keyedAssigned(after),
      "compacted content != tombstone-masked content")
    val probeCompacted = Similarity.ivfKnnJoin(compacted,
        embeddings.filter(col("vec_id") === 0), 10, nprobe = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(probeCompacted == probeDeleted,
      "probe over tombstones != probe over the physical rebuild")
    val outFiles = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(!outFiles.exists(_.startsWith("delta_")) &&
      !outFiles.exists(_.startsWith("tomb_")),
      s"compacted generation not segment-free: $outFiles")
    val physical = spark.read.parquet(s"$out/assigned")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(physical.intersect(delIds).isEmpty,
      "compaction did not physically reclaim deleted rows")
    // Dominance: re-admitting a tombstoned id leaves it deleted.
    val one = delIds.min
    Similarity.ivfAdmit(path,
      embeddings.filter(col("vec_id") === one), "b9")
    assert(!keyedAssigned(Similarity.loadIvfWithDeltas(spark, path))
      .exists(_._1 == one),
      "a later admission resurrected a tombstoned id")
  }

  test("PQ admission: delta codes equal the one-shot encode; combined full-candidate probe is exact") {
    // Round-11 ask #4: the IVF O(batch) admission contract on the PQ
    // index. pqAdmit encodes under the PERSISTED codebooks via pqEncode —
    // the same expression the base build ran — so admitted codes must
    // equal a one-shot encode of the full corpus, and the combined
    // base+delta relation at candidates >= corpus must return the exact
    // brute-force top-k (no recall lost to admission).
    val (base, batch) = baseAndBatch
    val cb = Similarity.pqTrain(base)
    val path = tempDir("graft_pq_admit")
    Similarity.savePq(Similarity.pqEncode(base, cb), cb, path)
    val cb2 = Similarity.loadPqCodebooks(spark, path)
    assert(cb2.m == cb.m && cb2.k == cb.k && cb2.dsub == cb.dsub &&
      cb2.books.flatten.flatten.toSeq == cb.books.flatten.flatten.toSeq,
      "codebook sidecar round-trip drifted")
    Similarity.pqAdmit(path, batch, "b0")
    val (cbL, enc) = Similarity.loadPqWithDeltas(spark, path)
    def codes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Int])] =
      df.select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1).toList: Seq[Int]))
        .sortBy(_._1).toSeq
    assert(codes(enc) == codes(Similarity.pqEncode(embeddings, cb)),
      "admitted codes != one-shot encode of the full corpus")
    val n = embeddings.count().toInt
    val exact = Similarity.bruteForceTopK(embeddings, 0, 10).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine_sim"))).toSeq
    val combined = Similarity.pqTopK(enc, cbL, 0, 10, candidates = n)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine_sim"))).toSeq
    assert(combined == exact,
      "combined base+delta full-candidate PQ probe diverged from exact")
  }

  test("external-root compaction folds stream segments and tombstones into a fresh generation") {
    // Round-12 ask #2: the q164/q165 layout — segments accumulating in a
    // root APART from the immutable base — previously had no compaction
    // entry point. ivfCompactTo(deltaRoots) must fold base + external
    // segments minus external tombstones into a delta- and tomb-free
    // generation, leaving both sources untouched.
    val (base, batch) = baseAndBatch
    val idx = Similarity.buildIvf(base, nlist = 8)
    val path = tempDir("graft_ivf_extbase")
    Similarity.saveIvf(idx, path)
    idx.unpersist()
    val root = tempDir("graft_ivf_extroot")
    // Two admission segments (the per-micro-batch stream layout) + one
    // tombstone, all external.
    Similarity.ivfAdmit(path, batch.filter(pmod(col("vec_id"), lit(20)) === 0),
      "sb0", deltaRoot = Some(root))
    Similarity.ivfAdmit(path, batch.filter(pmod(col("vec_id"), lit(20)) =!= 0),
      "sb1", deltaRoot = Some(root))
    val dels = embeddings.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select(col("vec_id"))
    val delIds = dels.collect().map(_.getLong(0)).toSet
    Similarity.ivfDelete(path, dels, "t0", deltaRoot = Some(root))
    val served = keyedAssigned(
      Similarity.loadIvfWithDeltas(spark, path, Some(Seq(root))))
    assert(served.nonEmpty && served.size < embeddings.count(),
      "fixture must mask at least one row")
    val out = tempDir("graft_ivf_extout")
    Similarity.ivfCompactTo(spark, path, out, deltaRoots = Some(Seq(root)))
    assert(keyedAssigned(Similarity.loadIvf(spark, out)) == served,
      "compacted external-root content != tombstone-masked served content")
    val outFiles = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(!outFiles.exists(n => n.startsWith("delta_") || n.startsWith("tomb_")),
      s"compacted generation not segment-free: $outFiles")
    val physical = spark.read.parquet(s"$out/assigned")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(physical.intersect(delIds).isEmpty,
      "external-root compaction did not physically reclaim tombstoned rows")
    // Sources untouched: the base's own layout still serves base rows
    // only; the external root keeps its segments for the caller to
    // retire after the pointer swap.
    assert(keyedAssigned(Similarity.loadIvfWithDeltas(spark, path)).size ==
      base.count(), "compaction mutated the base generation")
    val rootFiles = new java.io.File(root).listFiles().map(_.getName)
    assert(rootFiles.count(_.startsWith("delta_")) == 2 &&
      rootFiles.count(_.startsWith("tomb_")) == 1,
      "compaction mutated the external segment root")
  }

  test("PQ deletion: tombstones mask the encoded relation, equal the physical rebuild, compaction reclaims") {
    // Round-12 ask #3: the q165 deletion contract on the PQ family.
    val (base, batch) = baseAndBatch
    val cb = Similarity.pqTrain(base)
    val path = tempDir("graft_pq_del")
    Similarity.savePq(Similarity.pqEncode(base, cb), cb, path)
    Similarity.pqAdmit(path, batch, "b0")
    val dels = embeddings.filter(pmod(col("vec_id"), lit(7)) === 3)
      .select(col("vec_id"))
    val delIds = dels.collect().map(_.getLong(0)).toSet
    assert(delIds.exists(_ % 10 == 0) && delIds.exists(_ % 10 != 0),
      "fixture must hit base AND delta rows")
    Similarity.pqDelete(path, dels, "t0")
    val (cbL, enc) = Similarity.loadPqWithDeltas(spark, path)
    val allIds = embeddings.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(enc.select("vec_id").collect().map(_.getLong(0)).toSet ==
      allIds -- delIds, "served encoded relation != content minus deleted ids")
    // Probe over tombstones == probe over an index physically rebuilt
    // without the deleted rows, under the SAME codebooks.
    val n = embeddings.count().toInt
    def top(df: org.apache.spark.sql.DataFrame, books: Similarity.PqCodebooks) =
      Similarity.pqTopK(df, books, 0L, 10, candidates = n).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cosine_sim"))).toSeq
    val probeTomb = top(enc, cbL)
    val rebuilt = Similarity.pqEncode(
      embeddings.filter(pmod(col("vec_id"), lit(7)) =!= 3), cb)
    assert(probeTomb == top(rebuilt, cb),
      "PQ probe over tombstones != probe over the physical rebuild")
    assert(probeTomb.map(_._1).forall(!delIds(_)),
      "a deleted id surfaced in a PQ probe")
    // Compaction physically reclaims and drops every segment dir.
    val out = tempDir("graft_pq_reclaim")
    Similarity.pqCompactTo(spark, path, out)
    val (cbC, encC) = Similarity.loadPqWithDeltas(spark, out)
    def codes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Int])] =
      df.select("vec_id", "codes").collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1).toList: Seq[Int]))
        .sortBy(_._1).toSeq
    assert(codes(encC) == codes(enc) && cbC.k == cbL.k,
      "compacted PQ generation != tombstone-masked content")
    val outFiles = new java.io.File(out).listFiles().map(_.getName).toSet
    assert(!outFiles.exists(n => n.startsWith("delta_") || n.startsWith("tomb_")),
      s"compacted PQ generation not segment-free: $outFiles")
    assert(spark.read.parquet(s"$out/encoded").select("vec_id").collect()
      .map(_.getLong(0)).toSet.intersect(delIds).isEmpty,
      "PQ compaction did not physically reclaim deleted rows")
    // Dominance: re-admitting a tombstoned id leaves it deleted.
    val one = delIds.min
    Similarity.pqAdmit(path, embeddings.filter(col("vec_id") === one), "b9")
    assert(!Similarity.loadPqWithDeltas(spark, path)._2
      .select("vec_id").collect().map(_.getLong(0)).contains(one),
      "a later PQ admission resurrected a tombstoned id")
  }

  test("cell stats cover every quantizer cell, sum to the corpus, and flag a skewed admission") {
    // Round-12 ask #4: ivfAdmit's "the quantizer ages only via cell
    // imbalance (visible, monitorable)" promise, measured. The metric
    // must (a) account for every cell including empty ones, (b) sum to
    // the served corpus, (c) move when an admission batch piles onto one
    // cell — the drift signal that tells an operator compaction-with-
    // refit is due.
    val (base, batch) = baseAndBatch
    val idx = Similarity.buildIvf(base, nlist = 8)
    val path = tempDir("graft_ivf_stats")
    Similarity.saveIvf(idx, path)
    val nlist = idx.centroids.length
    idx.unpersist()
    val before = Similarity.ivfCellStats(
      Similarity.loadIvfWithDeltas(spark, path)).collect()
    assert(before.length == nlist, "stats must cover every quantizer cell")
    assert(before.map(_.getAs[Long]("n_vectors")).sum == base.count())
    val ratioBefore = before.head.getAs[Double]("imbalance_ratio")
    assert(before.forall(r =>
      math.abs(r.getAs[Double]("imbalance_ratio") - ratioBefore) < 1e-9),
      "imbalance_ratio must be the same global value on every row")
    assert(before.forall(r => math.abs(r.getAs[Double]("cell_skew") -
      r.getAs[Long]("n_vectors").toDouble * nlist / base.count()) < 1e-4))
    // Deliberately skewed admission: 2x-corpus-many copies of one vector
    // (fresh ids) — they all land in a single cell.
    val seed = embeddings.filter(col("vec_id") === 0)
      .select("embedding", "label").head()
    val spark2 = spark
    import spark2.implicits._
    val copies = (1 to 2 * base.count().toInt)
      .map(i => (1000000L + i, seed.getSeq[Float](0), seed.getInt(1)))
      .toDF("vec_id", "embedding", "label")
    Similarity.ivfAdmit(path, copies, "skew")
    val ixAfter = Similarity.loadIvfWithDeltas(spark, path)
    val after = Similarity.ivfCellStats(ixAfter).collect()
    assert(after.map(_.getAs[Long]("n_vectors")).sum ==
      base.count() + 2 * base.count())
    val ratioAfter = after.head.getAs[Double]("imbalance_ratio")
    assert(ratioAfter > ratioBefore,
      s"skewed admission not detected: $ratioBefore -> $ratioAfter")
    // The fattest cell is exactly where the copies were admitted.
    val copyCells = ixAfter.assigned.filter(col("vec_id") >= 1000000L)
      .select("cell").distinct().collect().map(_.getInt(0))
    assert(copyCells.length == 1, "identical copies split across cells")
    assert(after.maxBy(_.getAs[Long]("n_vectors")).getAs[Int]("cell") ==
      copyCells.head)
  }
}
