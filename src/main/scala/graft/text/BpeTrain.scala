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
    * (rank, left, right, merged, frequency) ordered by rank. */
  def learnMerges(docs: DataFrame, numMerges: Int = 20,
      textCol: String = "text"): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
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

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var continue = true
    while (rank <= numMerges && continue) {
      val top = vocab
        .filter(size(col("symbols")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(symbols) - 1), i -> struct(symbols[i - 1] AS l, symbols[i] AS r))"))
          .as("p"), col("n"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("freq"))
        .orderBy(desc("freq"), col("l"), col("r"))
        .limit(1)
        .collect()
      top.headOption match {
        case None => continue = false // every word fused to one symbol
        case Some(Row(l: String, r: String, freq: Long)) =>
          val merged = l + r
          merges += ((rank, l, r, merged, freq))
          // Greedy left-to-right non-overlapping fuse of (l, r) -> merged.
          vocab = vocab.select(
            expr(s"""aggregate(symbols, CAST(array() AS array<string>), (acc, x) ->
              CASE WHEN size(acc) > 0 AND element_at(acc, -1) = ${sqlStr(l)} AND x = ${sqlStr(r)}
                   THEN concat(slice(acc, 1, size(acc) - 1), array(${sqlStr(merged)}))
                   ELSE concat(acc, array(x)) END)""").as("symbols"),
            col("n"))
            .localCheckpoint(true) // constant plan depth across iterations
        case Some(other) => sys.error(s"unexpected row shape: $other")
      }
      rank += 1
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
    val words = docs
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
      .orderBy("doc_id")
  }
}
