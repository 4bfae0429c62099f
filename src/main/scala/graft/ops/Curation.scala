package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation primitives for training-data pipelines: deterministic
  * budget enforcement over a grouped corpus. */
object Curation {

  /** Scale-safe per-source running token total — the naive corpus-wide
    * `Window.partitionBy(source)` cumsum would cap parallelism at #sources
    * (with 5 sources, a 100 TB corpus serializes through 5 window tasks).
    * All the subtle machinery (driver-quantile-literal slices, per-(slice,
    * source) local windows, broadcast offsets) lives in the shared
    * [[Partitioning.slicedPrefix]] primitive; the result is exactly the
    * one-window answer (asserted hash-equal in CurationSpec, plan shape in
    * PlanSpec). */
  private def perSourceRunningTotal(tokenized: DataFrame): DataFrame =
    Partitioning.slicedPrefix(tokenized, "doc_id", Nil, Seq("source"),
        col("n_tokens"), "cum_tokens")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))

  /** Per-source token budget cap — the mixture-control primitive of
    * training-data curation ("at most N tokens from each source"): within
    * every source, documents are admitted in deterministic priority order
    * (ascending doc_id) while the running token total stays within
    * `maxTokensPerSource`; the rest are dropped.
    *
    * Running total via [[perSourceRunningTotal]]'s two-level prefix sum —
    * no per-source serialization at scale. Greedy-prefix semantics are
    * intentional: the admitted set is stable under corpus growth (new
    * higher-id docs never evict earlier ones), which keeps incremental
    * curation runs reproducible. */
  def tokenBudgetCap(documents: DataFrame, maxTokensPerSource: Long): DataFrame = {
    val tokenized = documents.select(col("doc_id"), col("source"),
      size(graft.text.TextOps.tokens(col("text"))).as("n_tokens"))
    perSourceRunningTotal(tokenized)
      .filter(col("cum_tokens") <= maxTokensPerSource)
      .orderBy("doc_id")
  }

  /** Deterministic stratified sample: exactly `min(perSource, |source|)`
    * documents from every source, chosen by ranking each source's docs on
    * `md5(doc_id)` — a seedless uniform permutation that any engine
    * reproduces bit-for-bit (no `rand()`, no partition-order dependence),
    * so eval-set construction and corpus inspection pulls are replayable
    * and oracle-checkable. Rows carry `sample_rank` so a caller can later
    * tighten the budget (rank ≤ m, m < perSource) WITHOUT resampling — the
    * ranks nest by construction.
    *
    * One window over source — a single shuffle keyed by the group column;
    * per-group state is O(1) (row_number), so a 100 TB corpus with bounded
    * sources streams through without skew concerns beyond the largest
    * source's row count. */
  def groupSample(documents: DataFrame, perSource: Int): DataFrame = {
    require(perSource > 0, "perSource must be positive")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__h"), col("doc_id"))
    documents
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("__h"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perSource)
      .select(col("doc_id"), col("source"), col("sample_rank"))
      .orderBy("doc_id")
  }

  /** Deterministic weighted sample without replacement per source —
    * Efraimidis–Spirakis A-ES: each doc gets key `ln(u) / w` (u a uniform
    * in (0,1], w its weight) and the top-`perSource` keys win; selection
    * probability is proportional to weight, and because u is derived from
    * `md5(doc_id)` instead of `rand()`, the sample is a pure function of
    * the data — replayable across runs, engines, and partitionings (the
    * reproducibility contract corpus mixing needs; same rationale as
    * [[groupSample]], which this generalizes from uniform to weighted).
    *
    * u takes the first 13 hex digits of the md5 (52 bits < the 53-bit
    * double mantissa, so the hex→int→double conversion is EXACT in any
    * engine; +1 keeps u > 0 for the log). Weight = n_chars: longer docs
    * are proportionally more likely, the usual token-mass-preserving
    * choice. One window shuffle keyed by source, O(1) per-group state —
    * the same scale shape as groupSample. */
  def weightedSample(documents: DataFrame, perSource: Int): DataFrame = {
    require(perSource > 0, "perSource must be positive")
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("long").cast("double") + 1) / lit(4503599627370496.0) // 2^52
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__k").desc, col("doc_id"))
    documents
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (log(u) / col("n_chars")).as("__k"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perSource)
      .select(col("doc_id"), col("source"), col("n_chars"), col("sample_rank"))
      .orderBy("doc_id")
  }

  /** Deterministic training-order assignment — the global-shuffle step of
    * pretraining-data assembly: writers need documents permuted (no
    * source/time runs survive into a training batch) and laid out in K
    * shard files, and the layout must be REPRODUCIBLE so a re-run of the
    * pipeline regenerates byte-identical shards. Both come from one
    * md5-derived key: shard = first-32-bits(md5(doc_id)) mod K — placement
    * is a pure function of the key, no coordination, uniform across
    * shards — and position = rank of the full md5 inside the shard (a
    * seedless permutation; adjacent doc_ids land far apart).
    *
    * Scale shape: ONE shuffle keyed by shard; each shard's window ranks
    * only its own ~N/K slice, so parallelism is K (pick K ≈ the writer
    * parallelism you want — at 100 TB that's thousands of shards, not
    * #sources). The md5 rank inside a window is the same
    * partition-independent ordering [[groupSample]] relies on. */
  def trainingShards(documents: DataFrame, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val h = md5(col("doc_id").cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col("doc_id"))
    documents
      .select(col("doc_id"), col("source"), h.as("__h"))
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)).cast("int"))
      .withColumn("position", row_number().over(w).cast("long") - 1)
      .select(col("doc_id"), col("source"), col("shard"), col("position"))
      .orderBy("doc_id")
  }

  /** Greedy sequence packing — the last step of pretraining-data assembly:
    * documents laid head-to-tail per source and cut into fixed
    * `seqLen`-token training sequences. Each document reports the sequence
    * it starts in (`start_seq`), its token offset inside it
    * (`start_offset`), and the sequence it ends in (`end_seq` — docs
    * longer than the remaining room straddle sequences, the standard
    * concat-then-chunk packing that wastes zero tokens to padding).
    *
    * Layout is a pure function of (source, doc_id) order, so reruns and
    * engines agree exactly; arithmetic is integer-only (`div`/`pmod` on
    * the cumulative token count — no float rounding at corpus-scale
    * offsets). Running total via [[perSourceRunningTotal]]'s two-level
    * prefix sum (exclusive form = inclusive minus the row's own count). */
  def packSequences(documents: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val tokenized = documents.select(col("doc_id"), col("source"),
      size(graft.text.TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    perSourceRunningTotal(tokenized)
      .withColumn("cum_before", col("cum_tokens") - col("n_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"cum_before div $seqLen").as("start_seq"),
        pmod(col("cum_before"), lit(seqLen.toLong)).as("start_offset"),
        expr(s"(cum_before + n_tokens - 1) div $seqLen").as("end_seq"))
      .orderBy("doc_id")
  }

  /** Deterministic mixture resampling — the other half of mixture control:
    * per-source sampling/repetition rates in percent. rate 50 keeps half the
    * docs, 100 keeps all, 250 emits 2 full epochs plus half a third — the
    * up/down-weighting training-data mixtures are built from ("2.5 epochs of
    * wiki, 0.3 epochs of web").
    *
    * Selection is arithmetic on the document id (`doc_id mod 100 < rate mod
    * 100` admits the partial epoch), NOT `rand()`: the admitted multiset is
    * a pure function of the input, so reruns, retried tasks, and the DuckDB
    * oracle all agree row-for-row — and the filter is a pushed-down scan
    * predicate, zero shuffle. Each admitted copy carries its `epoch` index
    * (1-based) so downstream shuffling/interleaving can key on it. */
  def mixtureSample(documents: DataFrame, ratesPercent: Map[String, Int],
      defaultPercent: Int = 100): DataFrame = {
    require((defaultPercent +: ratesPercent.values.toSeq).forall(_ >= 0),
      "sampling rates must be non-negative")
    val spark = documents.sparkSession
    import spark.implicits._
    val rates = ratesPercent.toSeq.toDF("source", "__rate")
    val rate = coalesce(col("__rate"), lit(defaultPercent))
    val copies = (floor(rate / 100) +
      when(pmod(col("doc_id"), lit(100)) < rate % 100, 1).otherwise(0)).cast("int")
    documents
      .join(broadcast(rates), Seq("source"), "left")
      .select(col("doc_id"), col("source"), copies.as("__copies"))
      .select(col("doc_id"), col("source"),
        explode(when(col("__copies") >= 1, sequence(lit(1), col("__copies")))
          .otherwise(array().cast("array<int>"))).as("epoch"))
      .orderBy("doc_id", "epoch")
  }

  /** Temperature-scaled mixture weights — the standard LLM-data recipe for
    * softening a raw-size mixture: source s gets sampling probability
    * p_s ∝ (tokens_s)^α with α = 1/2, which up-weights small high-quality
    * sources relative to proportional sampling (α = 1) without going
    * uniform (α = 0). α is fixed at 1/2 deliberately: `sqrt` is
    * correctly-rounded IEEE in every engine, so the weights are
    * reproducible cross-engine, where a general `pow(x, 0.3)` is
    * last-ulp implementation-defined.
    *
    * One groupBy over the corpus (token counts are exact BIGINT whitespace
    * counts, the q25 parity convention); the per-source frame is tiny
    * (#sources rows), so the normalization join is a broadcast and the
    * whole op is a single shuffle regardless of corpus size. `quota_tokens`
    * is each source's integer token allocation under `budgetTokens`,
    * computed from the 6-digit-rounded probability so both engines
    * allocate identically.
    *
    * The normalizer is a FIXED-ORDER left fold over the source-sorted
    * weight list (the q53 BM25 term-sum convention), not a plain `sum`:
    * float addition is order-sensitive at the last ulp, and a partial-agg
    * merge order that varies run-to-run would make `p_sample` itself
    * nondeterministic. A fold over #sources values is plan-trivial. */
  def temperatureMixture(documents: DataFrame, budgetTokens: Long): DataFrame = {
    val perSource = documents
      .select(col("source"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long").as("__t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))
      .withColumn("weight", sqrt(col("n_tokens").cast("double")))
    val total = perSource.agg(
      expr("aggregate(array_sort(collect_list(struct(source, weight))), " +
        "CAST(0 AS DOUBLE), (a, x) -> a + x.weight)").as("__tw"))
    perSource.crossJoin(broadcast(total))
      .withColumn("p_sample", round(col("weight") / col("__tw"), 6))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("weight"), 6).as("weight"), col("p_sample"),
        expr(s"CAST(round($budgetTokens * p_sample) AS BIGINT)")
          .as("quota_tokens"))
      .orderBy("source")
  }

  /** Curation FILTER FUNNEL — the per-stage rejection report every
    * quality-filter pipeline publishes (how many documents each rule
    * removed, in rule order, and how many survive): stage 1 keeps English,
    * 2 requires ≥ 30 words, 3 requires mean word length in a sane band,
    * 4 caps duplicate-token mass at 50%, 5 caps any single token at 10%
    * of the document. Each document is charged to its FIRST failing stage
    * — the funnel convention — so the stage counts sum with the survivors
    * to the corpus and `n_out(k) = n_in(k+1)` by construction.
    *
    * Every predicate is integer arithmetic (cross-multiplied ratios, e.g.
    * mean-word-length ∈ [3, 5.5] as `3·nw ≤ nc ∧ 2·nc ≤ 11·nw`), so the
    * report is bit-exact across engines with no float tolerance.
    *
    * Scale shape: ONE scan — the per-document signals and the first-fail
    * classification are map-side codegen (the token array is bound once
    * per row so the lambdas never re-split the text), the aggregation is a
    * ≤ 6-group partial count, and the funnel assembly runs on a 5-row
    * literal frame joined against those counts (the single-partition
    * window is over 5 rows, not data). At 100 TB this is the cost of
    * reading the corpus once — which is the floor for any funnel. */
  def filterFunnel(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sig = Partitioning.spread(documents)
      .select(col("lang"), length(col("text")).as("nc"),
        split(col("text"), " ").as("w"))
      .select(col("lang"), col("nc"), col("w"), array_distinct(col("w")).as("dw"))
      .select(col("lang"), col("nc"), size(col("w")).as("nw"),
        size(col("dw")).as("nd"),
        array_max(transform(col("dw"),
          t => size(filter(col("w"), x => x === t)))).as("topc"))
    val firstFail = when(col("lang") =!= "en", 1)
      .when(col("nw") < 30, 2)
      .when(!(lit(3) * col("nw") <= col("nc") &&
        lit(2) * col("nc") <= lit(11) * col("nw")), 3)
      .when(lit(2) * col("nd") < col("nw"), 4)
      .when(lit(10) * col("topc") > col("nw"), 5)
      .otherwise(0)
    val counts = sig.select(firstFail.as("ff")).groupBy(col("ff"))
      .agg(count(lit(1)).as("c"))
    // The 6-row literal frame (survivor slot 0 + the five stages) joined
    // against the counts ONCE — deriving the corpus total from the same
    // tiny frame, so the document scan appears exactly once in the plan
    // (a separate counts.agg(...) total would re-run the scan subtree).
    val stages = Seq((0, "__kept"), (1, "lang_en"), (2, "min_words"),
      (3, "word_shape"), (4, "dup_tokens"), (5, "top_token"))
      .toDF("stage_idx", "stage")
    val whole = Window.orderBy("stage_idx")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val prior = Window.orderBy("stage_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    stages
      .join(counts.withColumnRenamed("ff", "stage_idx"), Seq("stage_idx"), "left")
      .withColumn("n", coalesce(col("c"), lit(0L)))
      // Survivors (slot 0) count toward the corpus total but are not a
      // rejection — exclude them from the prior-rejections running sum.
      .withColumn("__rej", when(col("stage_idx") >= 1, col("n")).otherwise(lit(0L)))
      .withColumn("n_in",
        sum(col("n")).over(whole) - coalesce(sum(col("__rej")).over(prior), lit(0L)))
      .filter(col("stage_idx") >= 1)
      .select(col("stage_idx"), col("stage"), col("n_in"),
        col("n").as("n_rejected"), (col("n_in") - col("n")).as("n_out"))
      .orderBy("stage_idx")
  }
}
