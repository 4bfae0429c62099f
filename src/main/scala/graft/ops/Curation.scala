package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation primitives for training-data pipelines: deterministic
  * budget enforcement over a grouped corpus. */
object Curation {

  /** Per-source token budget cap — the mixture-control primitive of
    * training-data curation ("at most N tokens from each source"): within
    * every source, documents are admitted in deterministic priority order
    * (ascending doc_id) while the running token total stays within
    * `maxTokensPerSource`; the rest are dropped.
    *
    * One window over (source, doc_id) — a single shuffle keyed by source;
    * skew is bounded by the largest source (pre-split giant sources
    * upstream if one dominates). Greedy-prefix semantics are intentional:
    * the admitted set is stable under corpus growth (new higher-id docs
    * never evict earlier ones), which keeps incremental curation runs
    * reproducible. */
  def tokenBudgetCap(documents: DataFrame, maxTokensPerSource: Long): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"), col("source"),
        size(graft.text.TextOps.tokens(col("text"))).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= maxTokensPerSource)
      .orderBy("doc_id")
  }
}
