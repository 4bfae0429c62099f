package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus — BM25 scoring expressed as
  * joins and aggregations so it runs at corpus scale with no inverted-index
  * service: term statistics (df, avgdl) are tiny aggregates, per-document
  * term frequencies come from one explode-filter-aggregate pass, and the
  * final ranking is a TakeOrderedAndProject top-k. (An inverted index is a
  * *materialization* of exactly the tf frame built here — persist it keyed
  * by term to amortize repeated queries.)
  */
object Search {

  /** BM25 top-k (Robertson–Sparck Jones idf in the Lucene form
    * `ln(1 + (N − df + 0.5)/(df + 0.5))`, k1/b saturation):
    * score(D, Q) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl)).
    *
    * Engine-portability: the per-(doc, term) score is pivoted into one
    * column per query term and the document score is the LEFT-TO-RIGHT sum
    * in the caller's term order — a fixed IEEE evaluation order, so the
    * rounded score is reproducible across engines and partitionings (a
    * `sum()` over term rows would add in shuffle order and could drift an
    * ulp). Terms are bounded (a user query), so the pivot width is bounded.
    *
    * Scale shape: explode is filtered to query terms immediately (the
    * filter pushes inside the generator's consumer — non-query tokens never
    * reach a shuffle); df/avgdl are scalar-sized broadcasts; ranking is
    * top-k, not a global sort. */
  def bm25TopK(documents: DataFrame, terms: Seq[String], k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val docs = graft.ops.Partitioning.spread(documents)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("__toks"), size(col("__toks")).as("dl"))
    // Corpus statistics: one row (n_docs, total_dl) — broadcast to scorers.
    val corpus = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      // Tiny pin (≤ matching docs × |terms| rows): tf feeds the df
      // aggregate AND the scoring join — without it the tokenize + explode
      // pipeline re-executes per consumer (the round-13 q53 plan carried
      // FIVE copies of the split(text) subtree; a pinned tf leaves two
      // corpus passes: the dl statistics and the tf explode itself).
      .localCheckpoint(true)
    val df = tf.groupBy(col("tok")).agg(countDistinct(col("doc_id")).as("df"))
    val avgdl = col("total_dl").cast("double") / col("n_docs")
    val idf = log(lit(1) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1) - b + lit(b) * col("dl") / avgdl))
    val pivoted = tf
      .join(broadcast(df), Seq("tok"))
      .crossJoin(broadcast(corpus))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_matched_terms"),
        terms.map(t => max(when(col("tok") === t, termScore)).as(s"__s_$t")): _*)
    val score = terms
      .map(t => coalesce(col(s"__s_$t"), lit(0.0)))
      .reduceLeft(_ + _)
    pivoted
      .select(col("doc_id"), round(score, 6).as("bm25"), col("n_matched_terms"))
      .orderBy(desc("bm25"), col("doc_id"))
      .limit(k)
  }

  /** Terms kept per document by [[tfIdfTopTerms]]. */
  val TfIdfTopK = 3

  /** q158: corpus-wide TF-IDF keyword extraction — for EVERY document, the
    * [[TfIdfTopK]] terms with the highest `tf(t,D) · ln(N / df(t))`, ties
    * cut by term text so the per-document answer is unique. The
    * query-free dual of [[bm25TopK]]: retrieval scores fixed query terms
    * against all documents; this labels each document with its most
    * corpus-distinctive vocabulary (the standard keyword/topic-tagging
    * pass of a training-data pipeline). Scores stay unrounded through the
    * rank and are rounded to 6 digits only for presentation — `tf` and
    * `df` are exact integers and the score is one IEEE multiply of one
    * IEEE log, so both engines rank identically.
    *
    * Scale shape: TF-IDF is NOT content-pure (df and N are corpus
    * statistics), so it cannot ride [[TextOps.perDistinctContent]] — but
    * it has an exact multiplicity-weighted collapse: group byte-identical
    * texts once, count members `m`, compute per-distinct-text tf, take
    * `df = Σ m` over distinct texts containing the term and `N = Σ m`,
    * rank per distinct text, and fan the top-k back over an md5-key
    * equi-join. On the 97%-duplicated scale corpora this shrinks the
    * explode + window to the distinct corpus; the duplication probe
    * routes ~unique corpora straight to the direct form, which the
    * collapse reproduces exactly (same integers, same double ops). */
  def tfIdfTopTerms(documents: DataFrame, kTerms: Int = TfIdfTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kTerms >= 1, s"tfIdfTopTerms needs kTerms >= 1, got $kTerms")
    val docs = graft.ops.Partitioning.spread(documents)
      .select(col("doc_id"), col("text"))
    val collapse = TextOps.duplicationHeavy(docs, Seq("text"))
    // (gid-or-doc key, m, text): one row per distinct content when
    // collapsing, one per document otherwise (m = 1).
    val units =
      if (collapse)
        docs.groupBy(col("text")).agg(count(lit(1)).as("m"))
          .select(md5(col("text")).as("__g"), col("m"), col("text"))
      else docs.select(col("doc_id").as("__g"), lit(1L).as("m"), col("text"))
    val tf = units
      .select(col("__g"), col("m"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("__g"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("m")).as("m"))
    val df = tf.groupBy(col("term")).agg(sum(col("m")).as("df"))
    val corpus = units.agg(sum(col("m")).as("n_docs"))
    val scored = tf
      .join(df, Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("__s",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
    val top = scored
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__g")).orderBy(desc("__s"), col("term"))))
      .filter(col("__r") <= kTerms)
      .select(col("__g"), col("term"), col("tf"),
        round(col("__s"), 6).as("score"))
    val perDoc =
      if (collapse)
        docs.select(col("doc_id"), md5(col("text")).as("__g"))
          .join(top, Seq("__g"))
      else top.withColumnRenamed("__g", "doc_id")
    perDoc
      .select(col("doc_id"), col("term"), col("tf"), col("score"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** q158 oracle: the direct (uncollapsed) form — what both engine routes
    * compute. */
  def tfIdfSql(kTerms: Int = TfIdfTopK): String =
    s"""WITH toks AS (
       |  SELECT doc_id, t AS term FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
       |  WHERE t <> ''),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf,
       |    tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS s
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |rk AS (SELECT doc_id, term, tf, s,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS r
       |  FROM scored)
       |SELECT doc_id, term, tf, round(s, 6) AS score FROM rk
       |WHERE r <= $kTerms ORDER BY doc_id, term""".stripMargin

  /** Reciprocal-rank fusion of a lexical (BM25) and a dense (embedding
    * cosine) ranking — the standard hybrid-retrieval combiner:
    * RRF(d) = Σ_r 1/(c + rank_r(d)) over the rankings that contain d.
    * Ranks, not scores, are fused, so the two arms' incomparable score
    * scales never touch; with c = 60 (the original RRF constant) the sum
    * of at most two reciprocals of small integers is reproducible IEEE
    * math in any engine.
    *
    * Scale shape: each arm is already top-k (TakeOrderedAndProject); the
    * fusion operates on two ≤k-row frames — the rank windows and the
    * outer join cost nothing at any corpus size. Ids are fused on the
    * shared document id (vec_id references doc_id). */
  def rrfTopK(documents: DataFrame, embeddings: DataFrame,
      terms: Seq[String], queryVecId: Long, k: Int = 20, armK: Int = 50,
      c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && armK >= k, s"need 1 <= k <= armK, got k=$k armK=$armK")
    // Both arms order deterministically (score desc, id) — the same total
    // order their own oracles pin — so row_number is cross-engine stable.
    val lex = bm25TopK(documents, terms, armK)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(desc("bm25"), col("doc_id"))))
      .select(col("doc_id").as("id"), col("lex_rank"))
    val dense = graft.sim.Similarity.bruteForceTopK(embeddings, queryVecId, armK)
      .withColumn("dense_rank",
        row_number().over(Window.orderBy(desc("cosine_sim"), col("vec_id"))))
      .select(col("vec_id").as("id"), col("dense_rank"))
    lex.join(dense, Seq("id"), "full_outer")
      .select(col("id"), col("lex_rank"), col("dense_rank"),
        round(
          coalesce(lit(1.0) / (lit(c) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(c) + col("dense_rank")), lit(0.0)), 6)
          .as("rrf_score"))
      .orderBy(desc("rrf_score"), col("id"))
      .limit(k)
  }
}
