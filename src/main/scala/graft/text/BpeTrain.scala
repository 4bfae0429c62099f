package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** BPE merge learning — training a tokenizer ON the corpus (the step
  * upstream of everything [[TextOps.bpeTokenStats]] measures): iteratively
  * find the most frequent adjacent symbol pair in the word vocabulary and
  * fuse it, emitting the learned merge table.
  *
  * Distribution shape: the corpus is touched ONCE (explode + groupBy into
  * a word-frequency vocabulary — at 100 TB the vocab is millions of rows,
  * the corpus billions; everything after runs on the vocab). Each of the
  * `numMerges` iterations is one pair-count aggregation over the vocab
  * plus one narrow map applying the merge, with a localCheckpoint pinning
  * the plan depth constant (the [[graft.dedup.Dedup.clusterPairs]]
  * iteration discipline). The driver holds only the single best pair per
  * round.
  *
  * Semantics match reference BPE training: greedy left-to-right
  * non-overlapping application (aaa + merge(a,a) -> [aa, a]), frequency
  * counted per occurrence weighted by word count, deterministic
  * tie-break (freq desc, then pair lexicographic).
  */
object BpeTrain {

  /** Learn `numMerges` merges from a document corpus. Returns
    * (rank, left, right, merged, frequency) ordered by rank.
    *
    * INCREMENTAL pair counts (round-6): the pair-frequency frame is
    * maintained ACROSS rounds instead of recounted from the whole
    * vocabulary every batch. Fusing a batch changes the pair multiset of
    * exactly the words that contain an accepted pair, so each round
    * explodes only that affected slice twice (pre-fuse counts out,
    * post-fuse counts in) and folds the delta into the running frame —
    * at a realistic 30k-merge vocabulary the per-round cost collapses
    * from |vocab| explode+aggregate to |touched words| + a pair-table
    * merge (the pair table is symbol-pair-sized, orders of magnitude
    * smaller than the vocab). The maintained frame is exactly the full
    * recount by induction (BpeTrainSpec pins the invariant per round).
    *
    * Batched (round-5): each Spark round learns up to `maxBatch` merges
    * from one counted frame, so a 30k-merge vocabulary costs ~30k/batch
    * rounds instead of one per merge. The batch is NOT an approximation —
    * it accepts exactly the prefix of the (freq desc, pair lex) ordering
    * that classic sequential BPE provably learns in the same order:
    *
    *  - accepted pairs must be pairwise symbol-disjoint: fusing (l1,r1)
    *    cannot change the count of a pair touching neither l1 nor r1;
    *  - the batch stops at the FIRST conflicting pair, so every pair
    *    ranked above an accepted one is itself accepted (no skipped pair
    *    can re-rank above later batch members after its count decays);
    *  - every pair the batch CREATES (x·m or m·y for a merged symbol m)
    *    occurs only where the original corpus had a pair involving l or r
    *    — a conflicting pair, hence ranked at or below the stop pair — so
    *    accepted pairs are additionally truncated to frequencies STRICTLY
    *    above the stop frequency, leaving no room for a created pair to
    *    overtake one (ties included: tie-break order could favor the
    *    created pair, so equality is not safe);
    *  - the fallback batch is the single top pair, which IS the classic
    *    next merge by definition.
    *
    * BpeTrainSpec pins both the classic hand-computed sequence and
    * batched == sequential (maxBatch = 1) equality on the corpus fixture. */
  def learnMerges(docs: DataFrame, numMerges: Int = 20,
      textCol: String = "text", maxBatch: Int = 16,
      incrementalMinVocab: Long = 1L << 16): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    val spark = docs.sparkSession
    // One corpus pass: word-frequency vocabulary, words as char sequences.
    var vocab = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("symbols"),
        col("n"))
      .localCheckpoint(true)

    // Adjacent-pair counts of a (symbols, n) frame, `sign`-weighted so the
    // same aggregation emits both sides of an incremental delta.
    def pairCountsOf(df: DataFrame, sign: Int): DataFrame = df
      .filter(size(col("symbols")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(symbols) - 1), i -> struct(symbols[i - 1] AS l, symbols[i] AS r))"))
        .as("p"), col("n"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg((sum(col("n")) * sign).as("freq"))

    // Incremental maintenance only pays when the per-round full recount
    // (explode + aggregate over the WHOLE vocab) costs more than the
    // delta bookkeeping's extra jobs (affected filter, two delta counts,
    // pair-table merge, one more eager checkpoint per round). Below
    // `incrementalMinVocab` distinct words the fixed job overhead
    // dominates — measured 2.5× slower on the sf0.1 fixture's tiny
    // vocabulary — so small vocabs recount from scratch each round; the
    // realistic 30k+-merge production vocab keeps the delta path. Both
    // paths produce identical counts (BpeTrainSpec pins the incremental
    // frame against a from-scratch classic reference with the threshold
    // forced to 0).
    val incremental = vocab.count() >= incrementalMinVocab
    // The maintained frame: one full count at round 0, deltas after
    // (incremental mode only; otherwise recounted per round below).
    var pairCounts =
      if (incremental) pairCountsOf(vocab, 1).localCheckpoint(true)
      else pairCountsOf(vocab, 1)

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var continue = true
    while (rank <= numMerges && continue) {
      val want = math.min(maxBatch, numMerges - rank + 1)
      // Bounded driver state: at most want+1 (freq, l, r) rows per round,
      // read from the MAINTAINED frame — no vocab-wide recount.
      val top = pairCounts
        .orderBy(desc("freq"), col("l"), col("r"))
        .limit(want + 1)
        .collect()
        .map {
          case Row(l: String, r: String, freq: Long) => (l, r, freq)
          case other => sys.error(s"unexpected row shape: $other")
        }
      if (top.isEmpty) continue = false // every word fused to one symbol
      else {
        // Accepted prefix: symbol-disjoint, stopped at the first conflict
        // or at the want-th pair; then truncated to freq > stopFreq.
        val used = scala.collection.mutable.Set.empty[String]
        val prefix = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var stopFreq = Long.MinValue // no pair beyond the collected list
        var i = 0
        var open = true
        while (open && i < top.length) {
          val (l, r, f) = top(i)
          if (prefix.size >= want || used(l) || used(r)) { stopFreq = f; open = false }
          else { prefix += top(i); used += l; used += r }
          i += 1
        }
        val safe = prefix.takeWhile(_._3 > stopFreq)
        val accepted = if (safe.nonEmpty) safe.toSeq else Seq(top.head)
        accepted.foreach { case (l, r, f) =>
          merges += ((rank, l, r, l + r, f))
          rank += 1
        }
        // Greedy left-to-right non-overlapping fuse of each accepted pair,
        // stacked into ONE projection (disjointness makes the order
        // immaterial; ranks are assigned in batch order regardless) and
        // ONE job via the trailing localCheckpoint — constant plan depth
        // across rounds, bounded expression depth within one (<= maxBatch
        // stacked folds, the bpeEncode checkpoint discipline).
        def fuse(df: DataFrame): DataFrame = accepted.foldLeft(df) { case (d, (l, r, _)) =>
          d.select(
            expr(s"""aggregate(symbols, CAST(array() AS array<string>), (acc, x) ->
              CASE WHEN size(acc) > 0 AND element_at(acc, -1) = ${sqlStr(l)} AND x = ${sqlStr(r)}
                   THEN concat(slice(acc, 1, size(acc) - 1), array(${sqlStr(l + r)}))
                   ELSE concat(acc, array(x)) END)""").as("symbols"),
            col("n"))
        }
        // Incremental maintenance: only words CONTAINING an accepted
        // adjacent pair change their pair multiset under the fuse (the
        // CASE never fires elsewhere), so the delta is (post-fuse counts
        // − pre-fuse counts) over that slice alone. The CASE guard keeps
        // `sequence(1, size-1)` off single-symbol words (stop < start
        // yields a DESCENDING sequence, not an empty one).
        if (incremental) {
          val anyAccepted = accepted.map { case (l, r, _) =>
            s"(symbols[i - 1] = ${sqlStr(l)} AND symbols[i] = ${sqlStr(r)})"
          }.mkString(" OR ")
          val affected = vocab.filter(expr(
            s"""CASE WHEN size(symbols) < 2 THEN false
                ELSE exists(sequence(1, size(symbols) - 1), i -> $anyAccepted) END"""))
          pairCounts = pairCounts
            .unionByName(pairCountsOf(affected, -1))
            .unionByName(pairCountsOf(fuse(affected), 1))
            .groupBy(col("l"), col("r"))
            .agg(sum(col("freq")).as("freq"))
            .filter(col("freq") > 0)
            .localCheckpoint(true)
          vocab = fuse(vocab).localCheckpoint(true)
        } else {
          vocab = fuse(vocab).localCheckpoint(true)
          pairCounts = pairCountsOf(vocab, 1)
        }
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "left", "right", "merged", "frequency")
      .orderBy("rank")
  }

  /** Single-quoted SQL string literal with escaping. */
  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Tokenize a corpus with LEARNED merges: per-document word and
    * BPE-token counts under the trained vocabulary.
    *
    * The merges are applied once per DISTINCT word (the corpus's word
    * vocabulary, not its word instances) — ranked merges replayed in
    * order over the char sequence, exactly the greedy fuse used during
    * training — and documents join against that word→token-count map.
    * At 100 TB the expensive symbolic work is vocab-sized; the corpus
    * pays one explode + one equi-join on the word (Catalyst broadcasts
    * a bounded vocab).
    *
    * Plan depth is bounded: each merge stacks one `aggregate(...)`
    * expression onto the vocab projection, so every
    * `checkpointEveryMerges` (16) merges the frame is localCheckpoint'ed
    * — the [[learnMerges]] discipline. Without this, a realistic 30k-merge
    * vocabulary would blow up analysis/codegen on a ~30k-deep expression
    * tree long before data size matters; with it, depth stays <= 16
    * regardless of merge count (BpeTrainSpec drives 200 merges through). */
  def bpeEncode(docs: DataFrame, merges: DataFrame,
      textCol: String = "text"): DataFrame = {
    val checkpointEveryMerges = 16
    val ranked = merges.orderBy("rank")
      .select("left", "right", "merged").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // Content-collapsed (round 6): the corpus explode + vocab join run
    // once per DISTINCT text — copies contribute nothing to the distinct
    // word set and their counts are byte-identical to their rep's. The
    // merge-fold over the word vocabulary was already distinct-word.
    TextOps.perDistinctContent(docs, Seq(textCol)) { reps =>
      val words = reps
        .select(col("doc_id"), explode(TextOps.tokens(col(textCol))).as("w"))
        .filter(length(col("w")) > 0)
      val vocabEncoded = ranked.zipWithIndex.foldLeft(
        words.select("w").distinct()
          .withColumn("symbols",
            expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))) {
        case (df, ((l, r, m), i)) =>
          val next = df.withColumn("symbols",
            expr(s"""aggregate(symbols, CAST(array() AS array<string>), (acc, x) ->
              CASE WHEN size(acc) > 0 AND element_at(acc, -1) = ${sqlStr(l)} AND x = ${sqlStr(r)}
                   THEN concat(slice(acc, 1, size(acc) - 1), array(${sqlStr(m)}))
                   ELSE concat(acc, array(x)) END)"""))
          if ((i + 1) % checkpointEveryMerges == 0) next.localCheckpoint(true) else next
      }.select(col("w"), size(col("symbols")).as("n_word_tokens"))
      words.join(vocabEncoded, "w")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_words"),
          sum(col("n_word_tokens")).as("n_bpe_tokens"))
    }.orderBy("doc_id")
  }
}
