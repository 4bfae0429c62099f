package graft

import org.apache.spark.sql.functions.{col, length, sum}

import graft.text.BpeTrain

class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  test("learnMerges reproduces the classic hand-computed merge sequence") {
    // The standard BPE teaching corpus: hug x10, pug x5, pun x12, bun x4,
    // hugs x5. Pair counts round 1: (u,g) = 10+5+5 = 20 (hug, pug, hugs),
    // (u,n) = 12+4 = 16, (h,u) = 15, (p,u) = 17... wait: (p,u) appears in
    // pug(5) + pun(12) = 17. So round 1 best is (u,g) 20.
    // Round 2 (after ug): pun/bun still have (u,n) = 16; (p,u) drops to 12
    // (pun only). Best: (u,n) 16. Round 3: (h,ug) = 15 (hug + hugs).
    val docs = (
      Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, numMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(merges.toSeq == Seq(
      (1, "u", "g", "ug", 20L),
      (2, "u", "n", "un", 16L),
      (3, "h", "ug", "hug", 15L)))
  }

  test("merges apply greedily left-to-right without overlap") {
    // 'aaa' x2: pair (a,a) counts once per adjacent position = 2 per word
    // -> freq 4; after the merge each word is [aa, a] (non-overlapping),
    // so round 2's best pair is (aa, a) with freq 2.
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, numMerges = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.toSeq == Seq(("a", "a", 4L), ("aa", "a", 2L)))
  }

  test("learning stops early when every word is a single symbol") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, numMerges = 10).collect()
    assert(merges.length == 1) // (a,b) fuses everything; nothing left to merge
    assert(merges.head.getString(3) == "ab")
  }

  test("bpeEncode tokenizes with the learned vocabulary, hand-checked") {
    val docs = (
      Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, numMerges = 3) // ug, un, hug
    // One doc with all five words: hug->[hug]=1, pug->[p,ug]=2,
    // pun->[p,un]=2, bun->[b,un]=2, hugs->[hug,s]=2 => 9 tokens, 5 words.
    val sample = Seq((100L, "hug pug pun bun hugs")).toDF("doc_id", "text")
    val out = BpeTrain.bpeEncode(sample, merges).head()
    assert(out.getAs[Long]("n_words") == 5L)
    assert(out.getAs[Long]("n_bpe_tokens") == 9L)
    // Compression sanity on the training corpus itself: BPE tokens per
    // word must be strictly below raw chars per word and >= 1.
    val full = BpeTrain.bpeEncode(docs, merges)
      .agg(sum("n_bpe_tokens").as("t"), sum("n_words").as("w")).head()
    assert(full.getLong(0) >= full.getLong(1))
    val chars = docs.select(sum(length(col("text")))).head().getLong(0)
    assert(full.getLong(0) < chars)
  }

  test("bpeEncode handles a 200-merge table with bounded plan depth") {
    // Round 3's encoder stacked one aggregate(...) expression per merge on
    // a single projection — fine at 20 merges, fatal at a realistic 30k
    // vocabulary (analysis/codegen blow up on the expression tree). The
    // checkpoint-every-16 discipline makes depth independent of merge
    // count; a 200-merge synthetic table (12 checkpoints) proves it runs,
    // and the no-op merges leave the token count at the char count.
    val merges = (1 to 200)
      .map(i => (i, "L" + i, "R" + i, "L" + i + "R" + i))
      .toDF("rank", "left", "right", "merged")
    val docs = Seq((1L, "abc de"), (2L, "xyz")).toDF("doc_id", "text")
    val out = BpeTrain.bpeEncode(docs, merges).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")))
    // No synthetic pair matches real chars: every word stays fully split.
    assert(out.toSeq == Seq((1L, 2L, 5L), (2L, 1L, 3L)))

    // And a REAL learned table still encodes correctly after the change
    // (learning stops early at ~7 merges once every word is one symbol).
    val classic = (
      Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
        Seq.fill(4)("bun") ++ Seq.fill(5)("hugs"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val learned = BpeTrain.learnMerges(classic, numMerges = 20)
    val encoded = BpeTrain.bpeEncode(classic, learned)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    // 20 merges on this tiny corpus fuse every word to one token.
    assert(encoded == 36L, s"expected 36 single-token words, got $encoded")
  }

  test("batched merge learning equals sequential on the corpus fixture") {
    // The round-5 batching is exact by construction (disjoint top-prefix +
    // strict stop-frequency truncation); this pins it empirically: the
    // default batched path and maxBatch = 1 (one merge per Spark round,
    // the round-4 formulation) must learn the identical table.
    val docs = Tables.documents(spark, sf)
    val batched = BpeTrain.learnMerges(docs, numMerges = 40).collect()
    val sequential = BpeTrain.learnMerges(docs, numMerges = 40, maxBatch = 1).collect()
    assert(batched.map(_.toSeq).toSeq == sequential.map(_.toSeq).toSeq)
    assert(batched.length == 40)
  }

  test("incremental pair counts match a from-scratch reference over 60 corpus merges") {
    // Round 6 maintains the pair-frequency frame across rounds (delta of
    // the affected words only) instead of recounting the vocab. This is
    // the INDEPENDENT oracle for that bookkeeping: a driver-side classic
    // sequential BPE (full recount every merge, no Spark, no batching)
    // must produce the identical (left, right, frequency) sequence. 60
    // merges exercise many delta rounds, created-symbol pairs (x·m, m·y),
    // and count decay on skipped pairs.
    val docs = Tables.documents(spark, sf)
    val words = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.text.TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0).map(_.toString).toList -> r.getLong(1))
    var vocab: Map[List[String], Long] =
      words.groupMapReduce(_._1)(_._2)(_ + _)
    val expect = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to 60) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p => counts(p) += n)
      }
      if (counts.nonEmpty) {
        val ((l, r), f) = counts.minBy { case ((l, r), f) => (-f, l, r) }
        expect += ((l, r, f))
        def fuseWord(s: List[String]): List[String] = s match {
          case a :: b :: rest if a == l && b == r => (l + r) :: fuseWord(rest)
          case a :: rest => a :: fuseWord(rest)
          case Nil => Nil
        }
        vocab = vocab.toSeq.map { case (s, n) => fuseWord(s) -> n }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    // incrementalMinVocab = 0 FORCES the delta path — the fixture vocab
    // is tiny, so the default threshold would route to the full-recount
    // path and this oracle would never exercise the bookkeeping.
    val got = BpeTrain.learnMerges(docs, numMerges = 60,
      incrementalMinVocab = 0L).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == expect.result())
    // Both routes agree end-to-end (the threshold only picks a plan).
    val viaRecount = BpeTrain.learnMerges(docs, numMerges = 60,
      incrementalMinVocab = Long.MaxValue).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(viaRecount.toSeq == expect.result())
  }

  test("corpus-scale run: deterministic and ranked by frequency") {
    val docs = Tables.documents(spark, sf)
    val a = BpeTrain.learnMerges(docs, numMerges = 5).collect()
    val b = BpeTrain.learnMerges(docs, numMerges = 5).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val freqs = a.map(_.getLong(4)).toSeq
    // Merge frequencies can rise after a fuse creates a new symbol, but
    // rank 1 is by construction the global max pair count.
    assert(freqs.head == freqs.max)
    assert(a.length == 5)
  }
}
