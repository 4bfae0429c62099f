package graft.dedup

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines (SURVEY.md §2.11 X1/X2 +
  * build-target extensions): exact content-hash dedup, word-shingle n-gram
  * Jaccard, and MinHash+LSH near-dup with connected-component collapse.
  *
  * Scale posture: every stage is a join or aggregation keyed by hash/shingle
  * — no cartesian products. LSH banding bounds candidate pairs; the
  * connected-component pass is the standard iterative hash-to-min
  * propagation (O(diameter) joins, diameter is tiny for dup clusters).
  */
object Dedup {

  /** Exact dedup by content hash: one representative (min doc_id) per
    * distinct text + multiplicity. groupBy(sha256) scales to any corpus —
    * the shuffle key is the 32-byte hash, never the document body. */
  def exactDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_copies"))
      .select("doc_id", "content_hash", "n_copies")
      .orderBy("doc_id")

  /** Incremental ingest dedup — the snapshot-to-snapshot form of
    * [[exactDedup]]: which `incoming` documents are genuinely NEW against
    * an already-ingested corpus? Within-batch copies collapse to one
    * representative (min doc_id, with the batch multiplicity), and any
    * content already present in `existing` is dropped entirely.
    *
    * Scale shape: the probe is a LEFT ANTI equi-join keyed by the 32-byte
    * content hash — document bodies never shuffle, and the anti-join build
    * side is the existing corpus's distinct-hash set (narrow: hashes
    * only). At 100 TB that hash set is the natural thing to persist
    * between ingest runs (write it once, anti-join each new batch against
    * it) rather than re-hashing the corpus per batch. */
  def incrementalDedup(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val seen = existing.select(sha2(col("text"), 256).as("content_hash")).distinct()
    incoming
      .select(col("doc_id"), sha2(col("text"), 256).as("content_hash"))
      .join(seen, Seq("content_hash"), "left_anti")
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies_in_batch"))
      .select("doc_id", "content_hash", "n_copies_in_batch")
      .orderBy("doc_id")
  }

  /** Word `n`-shingles from a pre-materialized token array (documents
    * shorter than n words collapse to a single whole-text shingle).
    *
    * `toks` MUST be a bound column (not an inline `split(...)`): expressions
    * referenced inside a higher-order-function lambda are re-evaluated per
    * array element, so an inline split would re-tokenize the whole document
    * for every shingle — O(words²) per document instead of O(words·n).
    * [[shingled]] below sets the binding up correctly. */
  private def shingleExpr(text: org.apache.spark.sql.Column,
      toks: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    val sh = transform(
      sequence(lit(0), size(toks) - n),
      i => array_join(slice(toks, i + 1, lit(n)), " "))
    when(size(toks) < n, array(text)).otherwise(sh)
  }

  /** Word `n`-shingles of the text as an array column. Convenience form for
    * ad-hoc use on small data — the operators below go through [[shingled]],
    * which binds the token array once per row (see [[shingleExpr]]). */
  def shingles(text: org.apache.spark.sql.Column, n: Int = 3): org.apache.spark.sql.Column =
    shingleExpr(text, split(text, " "), n)

  /** (doc_id, shingle-array) with the tokenization materialized in its own
    * projection — CollapseProject keeps multi-referenced non-trivial aliases
    * in place, so the split runs exactly once per document — and the input
    * spread across the cluster first (a one-split fixture would otherwise
    * shingle on a single task; see [[graft.ops.Partitioning.spread]]). */
  private def shingled(documents: DataFrame, n: Int,
      extra: Seq[String] = Nil): DataFrame = {
    val carried = extra.map(col)
    graft.ops.Partitioning.spread(documents)
      .select(col("doc_id") +: col("text") +: split(col("text"), " ").as("__toks") +: carried: _*)
      .select(col("doc_id") +: shingleExpr(col("text"), col("__toks"), n).as("sh") +: carried: _*)
  }

  /** Intermediates of the duplication-aware Jaccard join, at the
    * distinct-text (`gid`) level — shared by [[ngramJaccardPairs]] (which
    * expands back to member pairs) and [[canonicalizeClusters]] (which
    * clusters the rep graph directly and never materializes the
    * d²-expanded pair set). `sizes` doubles as the non-empty-filtered-set
    * marker: a group absent from it has every shingle stop-filtered and
    * participates in no pair. */
  private[graft] case class JaccardGraph(members: DataFrame, groups: DataFrame,
      sizes: DataFrame, repPairs: DataFrame)

  /** The shared guts of the Jaccard family: collapse exact duplicates,
    * shingle the distinct texts, stop-shingle filter (df weighted by group
    * size), intersect-count equi-join, Jaccard threshold — everything up
    * to (but not including) the member-pair expansion.
    *
    * `pinShingles` materializes the df-filtered shingle stack once
    * (localCheckpoint) for callers that execute the graph in MORE than one
    * job — [[canonicalizeClusters]] collects the rep edges for clustering
    * and then assembles the labeled output in a second job, and without
    * the pin the whole shingle explode + document-frequency filter would
    * run twice. Single-job callers ([[ngramJaccardPairs]]) leave it off:
    * this round MEASURED the alternative (pinning the exploded stack for
    * every caller to collapse the plan's ~10 shingle-subtree copies) and
    * it LOST — materializing the multi-GB string stack through the block
    * manager cost 1.5-2.3x the re-executed codegen'd explodes (q28
    * 5.8→7.0+ s, q127 4.2→8.7 s, q146 4.1→6.4+ s at sf0.1, probe-
    * qualified over three JVMs), so recompute-over-materialize is the
    * deliberate choice here (guide §5: cache only when recompute is
    * dearer than the memory pressure). */
  private[graft] def ngramJaccardGraph(
      documents: DataFrame,
      n: Int,
      minJaccard: Double,
      maxDocFreqFraction: Double,
      pinShingles: Boolean = false): JaccardGraph = {
    val members = documents.select(md5(col("text")).as("gid"), col("doc_id"))
    val groups = members.groupBy(col("gid"))
      .agg(count(lit(1)).as("gsz"), min(col("doc_id")).as("rid"))
    val reps = documents.select(col("doc_id"), col("text"))
      .join(groups.select(col("rid").as("doc_id"), col("gid"), col("gsz")),
        Seq("doc_id"))
    val docShingles = shingled(reps, n, extra = Seq("gid", "gsz"))
      .select(col("gid"), col("gsz"), explode(array_distinct(col("sh"))).as("sh"))
    val total = documents.select(count(lit(1))).first().getLong(0)
    // Stop-shingle filter: a shingle present in most docs produces a
    // near-cartesian candidate set while carrying no dedup signal. df
    // counts ORIGINAL documents (sum of group sizes), not distinct texts.
    val rare = docShingles
      .groupBy(col("sh")).agg(sum(col("gsz")).as("df"))
      .filter(col("df") <= (total * maxDocFreqFraction).toLong)
    val filtered0 = docShingles.select(col("sh"), col("gid"))
      .join(rare.select("sh"), Seq("sh"))
    val filtered = if (pinShingles) filtered0.localCheckpoint(true) else filtered0
    // Sizes over the filtered universe — numerator and denominator must
    // count the same shingle population or the ratio underestimates
    // (identical docs would score < 1 whenever any shingle is filtered).
    val sizes = filtered.groupBy(col("gid")).agg(count(lit(1)).as("n_sh"))
    val a = filtered.select(col("sh"), col("gid").as("gid_a"))
    val b = filtered.select(col("sh"), col("gid").as("gid_b"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("gid_a") < col("gid_b"))
      .groupBy(col("gid_a"), col("gid_b"))
      .agg(count(lit(1)).as("n_common"))
    val repPairs = inter
      .join(sizes.select(col("gid").as("gid_a"), col("n_sh").as("n_a")), Seq("gid_a"))
      .join(sizes.select(col("gid").as("gid_b"), col("n_sh").as("n_b")), Seq("gid_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= minJaccard)
      .select("gid_a", "gid_b", "n_common", "jaccard")
    JaccardGraph(members, groups, sizes, repPairs)
  }

  /** N-gram Jaccard similarity join over the *df-filtered shingle universe*:
    * explode distinct shingles, drop stop-shingles (document frequency above
    * `maxDocFreqFraction` of the corpus), equi-join on the surviving
    * shingles, count intersections, derive |A ∪ B| from per-doc counts of
    * the SAME filtered universe — so the ratio is a true Jaccard of the
    * filtered sets (identical documents score exactly 1.0). Classic
    * distributed set-similarity join — the shuffle is keyed by shingle, and
    * the stop-shingle filter is what keeps common-shingle skew from going
    * near-cartesian at scale. Emits pairs with jaccard ≥ `minJaccard`.
    *
    * Duplication-aware: Jaccard is a pure function of CONTENT, so exact
    * duplicates are collapsed first (md5 content groups, min-id
    * representative) and the shingle self-join runs over distinct texts
    * only; member pairs are expanded back afterwards (cross-group pairs
    * from the representative verdict, intra-group pairs at jaccard 1.0).
    * Document frequencies are weighted by group size, so the stop-shingle
    * cut sees the original corpus — the output is row-identical to the
    * naive all-docs join (the q28 oracle runs on all docs). On a corpus
    * with duplication factor d this cuts the quadratic join stage d²×:
    * the 10x-replicated sf1 sweep spends its wall on output expansion,
    * not on d²-inflated intersection counting — which is exactly how a
    * 100 TB web crawl (30-50% exact dups) must run this operator. */
  def ngramJaccardPairs(
      documents: DataFrame,
      n: Int = 3,
      minJaccard: Double = 0.2,
      maxDocFreqFraction: Double = 0.5): DataFrame = {
    val g = ngramJaccardGraph(documents, n, minJaccard, maxDocFreqFraction)
    import g.{members, repPairs, sizes}
    // Cross-group expansion: every member pair inherits the representative
    // verdict (the integers n_common/n_a/n_b are the same, so the double
    // is bit-identical to the naive join's).
    val cross = repPairs
      .join(members.select(col("gid").as("gid_a"), col("doc_id").as("__ida")), Seq("gid_a"))
      .join(members.select(col("gid").as("gid_b"), col("doc_id").as("__idb")), Seq("gid_b"))
      .select(least(col("__ida"), col("__idb")).as("doc_a"),
        greatest(col("__ida"), col("__idb")).as("doc_b"),
        col("n_common"), col("jaccard"))
    // Intra-group expansion: identical texts share the full filtered set —
    // jaccard exactly 1.0 — unless that set is EMPTY (0/0), where the
    // naive join emits nothing (no shared shingle rows); the n_sh join
    // (inner, over filtered-universe sizes) drops those groups here too.
    val m1 = members.select(col("gid"), col("doc_id").as("__ida"))
    val m2 = members.select(col("gid"), col("doc_id").as("__idb"))
    val intra = m1.join(m2, Seq("gid"))
      .filter(col("__ida") < col("__idb"))
      .join(sizes, Seq("gid"))
      .select(col("__ida").as("doc_a"), col("__idb").as("doc_b"),
        col("n_sh").as("n_common"), lit(1.0).as("jaccard"))
    cross.unionByName(intra)
      .orderBy("doc_a", "doc_b")
  }

  /** Benchmark decontamination: (train, bench) document pairs sharing at
    * least `minShared` distinct word `n`-grams — the standard eval-leakage
    * check run before training (n=8..13 word grams in published pipelines).
    * Returns every contaminated pair with its collision count plus the
    * contaminated fraction of the benchmark document's grams, so callers can
    * threshold on either absolute or relative overlap.
    *
    * Scale shape: the benchmark side is the small one (eval suites are
    * thousands of docs; the training corpus is the 100 TB side), so the join
    * is keyed by gram with the bench side broadcast-able after its distinct;
    * grams occurring in more than `maxDocFreq` TRAINING docs are dropped
    * first — the boilerplate guard that stops a ubiquitous gram from
    * pairing every training doc with every bench doc. */
  def ngramContamination(train: DataFrame, bench: DataFrame, n: Int = 8,
      minShared: Long = 1L, maxDocFreq: Long = 1000L): DataFrame = {
    val trainGrams = shingled(train, n)
      .select(col("doc_id").as("train_doc"), explode(array_distinct(col("sh"))).as("sh"))
    val benchGrams = shingled(bench, n)
      .select(col("doc_id").as("bench_doc"), explode(array_distinct(col("sh"))).as("sh"))
    contaminationFromGrams(trainGrams, benchGrams, minShared, maxDocFreq)
  }

  /** [[ngramContamination]] when both splits come from ONE corpus frame:
    * shingles are computed once and routed by `isBench` — at 100 TB the
    * shingling scan dominates, so folding the two passes into one halves
    * the operator's cost (q54 uses this form). The single-execution
    * guarantee comes from exchange reuse: every branch (train grams, bench
    * grams, df filter, bench sizes) hangs off the same `spread` shuffle,
    * and AQE's ReuseExchange collapses the identical subplans at runtime —
    * asserted by DedupSpec against the executed plan.
    *
    * DUPLICATION-AWARE (round-10: q54 was the board's worst surviving
    * scale decade, r103 = 4.0×, because on the 97%-duplicated scale
    * corpora BOTH splits shingled every byte-identical copy): when the
    * probe says the corpus is duplication-heavy, identical texts collapse
    * to one representative BEFORE shingling — collisions are a pure
    * function of (train text, bench text), so the gram equi-join runs
    * over distinct texts only and member pairs expand back afterwards
    * (an output-sized join). The training-side document frequency is
    * weighted by each group's TRAIN member count, so the rare-gram cut
    * sees the original corpus and the output is row-identical to the
    * direct route (the q54 oracle runs on all docs; DedupSpec pins
    * route equality on a duplicated fixture). A content group can hold
    * members of BOTH splits — the gid-level join keeps gid_t == gid_b
    * pairs (identical text across the split boundary shares every gram),
    * which the per-split member expansion then fans out exactly like the
    * naive join does. */
  def ngramContaminationSplit(documents: DataFrame,
      isBench: org.apache.spark.sql.Column, n: Int = 8,
      minShared: Long = 1L, maxDocFreq: Long = 1000L): DataFrame = {
    if (graft.text.TextOps.duplicationHeavy(documents, Seq("text")))
      return ngramContaminationSplitCollapsed(documents, isBench, n, minShared, maxDocFreq)
    val grams = shingled(documents.withColumn("__bench", isBench), n, extra = Seq("__bench"))
      .select(col("doc_id"), col("__bench"), explode(array_distinct(col("sh"))).as("sh"))
    val trainGrams = grams.filter(!col("__bench")).select(col("doc_id").as("train_doc"), col("sh"))
    val benchGrams = grams.filter(col("__bench")).select(col("doc_id").as("bench_doc"), col("sh"))
    contaminationFromGrams(trainGrams, benchGrams, minShared, maxDocFreq)
  }

  /** The collapsed route of [[ngramContaminationSplit]] — see its doc. */
  private def ngramContaminationSplitCollapsed(documents: DataFrame,
      isBench: org.apache.spark.sql.Column, n: Int,
      minShared: Long, maxDocFreq: Long): DataFrame = {
    val tagged = documents.withColumn("__bench", isBench)
    val members = tagged.select(md5(col("text")).as("gid"), col("doc_id"), col("__bench"))
    // Per-group split census: how many TRAIN members (the df weight) and
    // whether each side is populated at all (prunes the gid join's inputs).
    val groups = members.groupBy(col("gid")).agg(
      sum(when(!col("__bench"), 1L).otherwise(0L)).as("n_train"),
      sum(when(col("__bench"), 1L).otherwise(0L)).as("n_bench"),
      min(col("doc_id")).as("rid"))
    val reps = tagged.select(col("doc_id"), col("text"))
      .join(groups.select(col("rid").as("doc_id"), col("gid"),
        col("n_train"), col("n_bench")), Seq("doc_id"))
    val grams = shingled(reps, n, extra = Seq("gid", "n_train", "n_bench"))
      .select(col("gid"), col("n_train"), col("n_bench"),
        explode(array_distinct(col("sh"))).as("sh"))
      // One shingling feeds four consumers (df, both join sides, bench
      // sizes): pin it once, ngramJaccardGraph's discipline.
      .localCheckpoint(true)
    // df counts ORIGINAL training documents: each distinct text contributes
    // its gram once per TRAIN member. Groups with n_train = 0 contribute 0,
    // which matches the direct route (its df scans train grams only); a
    // bench-only gram then has df 0 ≤ maxDocFreq, but it cannot collide —
    // the train side of the join has no row for it.
    val rare = grams.groupBy(col("sh")).agg(sum(col("n_train")).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("sh")
    val filtered = grams.join(rare, Seq("sh"))
    val trainSide = filtered.filter(col("n_train") > 0)
      .select(col("sh"), col("gid").as("gid_t"))
    val benchSide = filtered.filter(col("n_bench") > 0)
      .select(col("sh"), col("gid").as("gid_b"))
    val gidPairs = trainSide.join(benchSide, Seq("sh"))
      .groupBy(col("gid_t"), col("gid_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    // n_bench_grams counts ALL distinct grams of the bench text (the
    // direct route sizes bench docs BEFORE the rarity cut).
    val benchSizes = grams.filter(col("n_bench") > 0)
      .groupBy(col("gid")).agg(count(lit(1)).as("n_bench_grams"))
    // Output-sized member expansion: every (train member of gid_t, bench
    // member of gid_b) pair inherits the representative collision count.
    val trainMembers = members.filter(!col("__bench"))
      .select(col("gid").as("gid_t"), col("doc_id").as("train_doc"))
    val benchMembers = members.filter(col("__bench"))
      .select(col("gid").as("gid_b"), col("doc_id").as("bench_doc"))
    gidPairs
      .join(trainMembers, Seq("gid_t"))
      .join(benchMembers, Seq("gid_b"))
      .join(benchSizes.withColumnRenamed("gid", "gid_b"), Seq("gid_b"))
      .withColumn("contaminated_frac",
        round(col("n_shared").cast("double") / col("n_bench_grams"), 6))
      .select("train_doc", "bench_doc", "n_shared", "contaminated_frac")
      .orderBy("train_doc", "bench_doc")
  }

  private def contaminationFromGrams(trainGrams: DataFrame, benchGrams: DataFrame,
      minShared: Long, maxDocFreq: Long): DataFrame = {
    val rare = trainGrams
      .groupBy(col("sh")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("sh")
    val benchSizes = benchGrams.groupBy(col("bench_doc")).agg(count(lit(1)).as("n_bench_grams"))
    trainGrams
      .join(rare, Seq("sh"))
      .join(benchGrams, Seq("sh"))
      .groupBy(col("train_doc"), col("bench_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(benchSizes, Seq("bench_doc"))
      .withColumn("contaminated_frac",
        round(col("n_shared").cast("double") / col("n_bench_grams"), 6))
      .select("train_doc", "bench_doc", "n_shared", "contaminated_frac")
      .orderBy("train_doc", "bench_doc")
  }

  /** MinHash near-dup candidate pairs — native banded form (the SimHash
    * band-blocking discipline from [[graft.text.TextOps.simHashNearDups]]
    * applied to MinHash):
    *
    *  1. distinct word shingles per document (one projection, no shuffle);
    *  2. `numHashTables` MinHash values per doc, each `min over shingles of
    *     xxhash64(seed=b, shingle)` — computed INSIDE a higher-order
    *     `transform`/`array_min`, so signatures cost zero shuffles and stay
    *     in whole-stage codegen;
    *  3. candidates = self-equi-join on (band, minhash value): any pair
    *     agreeing on at least one of the `numHashTables` hash functions
    *     collides — an equi-join on a narrow (band, value, doc_id) stack,
    *     never a cross join;
    *  4. exact Jaccard distance on the candidate pairs from the original
    *     distinct-shingle sets (`array_intersect`/`array_union` — true set
    *     Jaccard, not the hashed-index approximation MLlib's
    *     `approxSimilarityJoin` computes over its 2^18 HashingTF buckets).
    *
    * Replaces the round-1..4 MLlib `MinHashLSH.approxSimilarityJoin` path,
    * which materialized one row per (row, band) WITH the full feature
    * vector and signature attached — the explode made q30 the slowest
    * query on the board (4.1 s at sf0.1; round-4 verdict item 2). Here the
    * exploded stack carries 24 bytes/row, and document payloads are only
    * touched again for the surviving candidates. DedupSpec pins pair-set
    * equality with the retained MLlib reference implementation at the same
    * threshold; PlanSpec pins the no-cartesian candidate shape.
    *
    * Returns (doc_a, doc_b, dist = jaccard distance ≤ maxDistance).
    */
  def minHashPairs(
      documents: DataFrame,
      n: Int = 3,
      maxDistance: Double = 0.6,
      numHashTables: Int = 8): DataFrame =
    // Detach the result so callers never inherit the shingle-set storage
    // (only near-dup candidates survive — tiny relative to the corpus).
    minHashPairsPlanned(documents, n, maxDistance, numHashTables)
      .localCheckpoint(true)

  /** The un-materialized plan behind [[minHashPairs]] — split out so
    * PlanSpec can assert the candidate-generation shape (equi-join, no
    * cartesian) on the physical plan before localCheckpoint hides it
    * behind an RDD scan. */
  private[graft] def minHashPairsPlanned(
      documents: DataFrame,
      n: Int,
      maxDistance: Double,
      numHashTables: Int): DataFrame = {
    // Shingles live as 64-bit hashes from the first projection on: the
    // n-gram hash folds n consecutive token hashes directly, so no shingle
    // STRING is ever materialized (the first native attempt built string
    // arrays and paid 2 s of interpreted array_join/slice plus a 4 KB/row
    // set payload through every later join — profiled at sf0.1). Jaccard
    // over distinct 64-bit shingle hashes equals raw-shingle Jaccard up to
    // hash collisions (~1e-10 per pair at these set sizes).
    val toks = graft.ops.Partitioning.spread(documents)
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("__toks"))
    val gram = transform(
      sequence(lit(0), size(col("__toks")) - n),
      i => xxhash64((0 until n).map(j => element_at(col("__toks"), i + j + 1)): _*))
    val shl = when(size(col("__toks")) < n, array(xxhash64(col("text")))).otherwise(gram)
    // Materialized once (~8 bytes per shingle): feeds the signature
    // computation AND both distance joins (blocks released by the
    // ContextCleaner when the frame drops).
    val sets = toks.select(col("doc_id"), array_distinct(shl).as("__shl"))
      .localCheckpoint(true)
    // One row per (doc, band) via a single posexplode — not a
    // numHashTables-way union, which costs one scan per band — and
    // materialized once: both sides of the self-join read the tiny
    // (doc, band, value, size) stack instead of re-running the 8
    // per-shingle hash passes per side.
    val sigv = array((0 until numHashTables).map { b =>
      array_min(transform(col("__shl"), h => xxhash64(lit(b), h)))
    }: _*)
    val bands = sets
      .select(col("doc_id"), size(col("__shl")).as("__sz"), posexplode(sigv))
      .toDF("doc_id", "__sz", "band", "band_val")
      .localCheckpoint(true)
    // Exact size prune on the banded candidates: jaccard <= min/max of the
    // set sizes, so any pair whose smaller set is below (1 - maxDistance)
    // of the larger CANNOT reach the threshold — dropped before the
    // distinct and the set joins, zero recall loss.
    val minJaccard = 1.0 - maxDistance
    val cands = bands.select(col("band"), col("band_val"),
        col("doc_id").as("doc_a"), col("__sz").as("__sz_a"))
      .join(bands.select(col("band"), col("band_val"),
        col("doc_id").as("doc_b"), col("__sz").as("__sz_b")),
        Seq("band", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(least(col("__sz_a"), col("__sz_b")).cast("double") >=
        lit(minJaccard) * greatest(col("__sz_a"), col("__sz_b")))
      .select("doc_a", "doc_b")
      .distinct()
    val pairs = cands
      .join(sets.select(col("doc_id").as("doc_a"), col("__shl").as("__shl_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("__shl").as("__shl_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (lit(1.0) - size(array_intersect(col("__shl_a"), col("__shl_b"))).cast("double") /
          size(array_union(col("__shl_a"), col("__shl_b"))).cast("double")).as("dist"))
      .filter(col("dist") <= maxDistance)
      .orderBy("doc_a", "doc_b")
    pairs
  }

  /** The MLlib `MinHashLSH.approxSimilarityJoin` formulation, retained as
    * the reference implementation [[minHashPairs]] is spec-checked against
    * (DedupSpec asserts pair-set equality at the same threshold). Not on
    * any query path: the native form generates the same banded-candidate
    * shape without exploding feature vectors per (row, band). */
  private[graft] def minHashPairsMLlib(
      documents: DataFrame,
      n: Int = 3,
      maxDistance: Double = 0.6,
      numHashTables: Int = 8): DataFrame = {
    val withShingles = shingled(documents, n)
    val tf = new HashingTF()
      .setInputCol("sh").setOutputCol("features").setNumFeatures(1 << 18)
    // Cached: feats feeds the LSH fit AND both sides of the self-join —
    // without it the shingle+hash pipeline runs three times.
    val feats = tf.transform(withShingles).cache()
    val mh = new MinHashLSH()
      .setInputCol("features").setOutputCol("sig")
      .setNumHashTables(numHashTables).setSeed(42)
    val model = mh.fit(feats)
    val pairs = model
      .approxSimilarityJoin(feats, feats, maxDistance, "dist")
      .select(
        col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"),
        col("dist"))
      .filter(col("doc_a") < col("doc_b"))
      .orderBy("doc_a", "doc_b")
      // Detach the result from the cached input so callers never inherit
      // feats' storage (localCheckpoint materializes the candidate pairs —
      // tiny relative to the corpus: only near-dup candidates survive).
      .localCheckpoint(true)
    feats.unpersist()
    pairs
  }

  /** Collapse near-dup pairs into clusters and pick one representative per
    * cluster. Returns (doc_id, cluster_id, is_representative).
    *
    * Size-adaptive (the [[graft.sim.Similarity.cosineNearDupPairs]]
    * discipline): when the edge set is bounded (≤ `driverEdgeCap`,
    * default 2M ≈ 32 MB — fetched via limit(cap+1), so an over-cap graph
    * never lands on the driver), connected components run as driver
    * union-find and come back as one broadcast join: constant job count
    * instead of ~4 scheduled stages per propagation round, which is pure
    * fixed overhead on a dup graph of thousands of edges. Above the cap —
    * the genuinely-big-graph regime — the distributed iterative
    * hash-to-min propagation with pointer jumping takes over (each round,
    * every doc adopts the smallest doc_id reachable over one edge;
    * converges in O(log diameter) rounds and REFUSES to return
    * unconverged labels). DedupSpec pins label equality between the two
    * paths on the fixture. */
  def clusterPairs(documents: DataFrame, pairs: DataFrame, maxIter: Int = 50,
      driverEdgeCap: Int = 2000000): DataFrame = {
    val spark = documents.sparkSession
    val bounded = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .limit(driverEdgeCap + 1).collect()
    if (bounded.length <= driverEdgeCap) {
      // Union-find with path compression + union by min-root: roots are the
      // smallest member, matching the iterative path's min-label semantics.
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      bounded.foreach { row =>
        val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
        if (a != b) { val (lo, hi) = (math.min(a, b), math.max(a, b)); parent(hi) = lo }
      }
      // Snapshot keys before the final find() pass: path compression
      // rewrites values in place.
      val labels = parent.keys.toSeq.map(k => (k, find(k)))
      import spark.implicits._
      val labelDf = labels.toDF("doc_id", "cluster_id")
      return documents.select(col("doc_id"))
        .join(broadcast(labelDf), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .withColumn("is_representative", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    }
    clusterPairsIterative(documents, pairs, maxIter)
  }

  /** The distributed label-propagation path of [[clusterPairs]] — also the
    * spec hook that pins its equality with the union-find fast path. */
  private[graft] def clusterPairsIterative(documents: DataFrame, pairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    // Undirected edge list, both directions.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .cache()
    // Each generation is localCheckpoint'ed: plan depth stays constant
    // instead of growing a join per iteration, and the superseded
    // generation's blocks are released by the ContextCleaner once its
    // DataFrame reference is dropped — executor storage stays flat across
    // rounds (iterative-lineage hygiene at 100 TB).
    var labels = documents.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val propagated = labels
        .join(neighborMin, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"),
          col("cluster_id").as("__old"))
      // Pointer jumping (path compression): replace each label by its
      // LABEL'S label. Plain min-propagation alone needs diameter rounds —
      // a chain longer than maxIter would silently yield WRONG clusters
      // (the sf0.1 oracle caught exactly this in round 3, and the loop now
      // REFUSES to return unconverged labels); the compression step cuts
      // the round count several-fold (a 200-node path closes in ~9 rounds,
      // not 199). Labels are doc_ids, so the self-join key always
      // resolves, and labels are monotone non-increasing.
      val parents = propagated.select(
        col("doc_id").as("__p_id"), col("cluster_id").as("__p_label"))
      val next = propagated
        .join(parents, col("cluster_id") === col("__p_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("__p_label"), col("cluster_id")).as("cluster_id"),
          // __changed rides along so convergence is read off the already
          // materialized checkpoint — no extra join-and-count pass.
          (coalesce(col("__p_label"), col("cluster_id")) < col("__old")).as("__changed"))
        .localCheckpoint()
      converged = next.filter(col("__changed")).limit(1).count() == 0
      labels = next.drop("__changed")
      iter += 1
    }
    edges.unpersist()
    require(converged,
      s"clusterPairs: not converged after $maxIter rounds — raise maxIter " +
        "(partial labels would be WRONG clusters, not approximations). The loop " +
        "exits on the first no-change round, so a generous cap costs nothing.")
    labels
      .withColumn("is_representative", col("doc_id") === col("cluster_id"))
      .orderBy("doc_id")
  }

  /** End-to-end MinHash near-dup dedup: pairs → clusters → representatives.
    *
    * Duplication-aware, like [[ngramJaccardPairs]]: Jaccard distance is a
    * pure function of content, so exact-duplicate texts are collapsed to
    * one representative (md5 groups, min-id rep) BEFORE the banded join —
    * identical copies share every band, so on a corpus with duplication
    * factor d the naive candidate set carries d² rows per near-dup pair
    * (the 30x sweep measured 52 s of exactly that). Components are
    * invariant under the collapse: copies are at distance 0 from their
    * rep (full connection inside a group), and any cross-group member
    * pair is similar iff the reps are, so expanding each member to its
    * rep's cluster label reproduces the naive output row-for-row. The rep
    * label is already the min doc_id of its component's members (each rep
    * is its group's min id, the label is the min rep id). */
  def minHashDedup(documents: DataFrame, n: Int = 3, maxDistance: Double = 0.6): DataFrame = {
    val members = documents.select(md5(col("text")).as("gid"), col("doc_id"))
    val groups = members.groupBy(col("gid")).agg(min(col("doc_id")).as("rid"))
    val reps = documents.select(col("doc_id"), col("text"))
      .join(groups.select(col("rid").as("doc_id"), col("gid")), Seq("doc_id"))
    val repLabels = clusterPairs(reps, minHashPairs(reps, n, maxDistance))
      .select(col("doc_id").as("rid"), col("cluster_id"))
    members
      .join(groups, Seq("gid"))
      .join(repLabels, Seq("rid"))
      .select(col("doc_id"), col("cluster_id"),
        (col("doc_id") === col("cluster_id")).as("is_representative"))
      .orderBy("doc_id")
  }

  /** Near-dup cluster CANONICALIZATION — the selection policy that turns a
    * cluster assignment into an actual deduplicated corpus: one row per
    * n-gram-Jaccard cluster with the kept document (longest `n_chars`,
    * ties to the smallest `doc_id` — "keep the fullest copy"), the member
    * count, and the bytes the collapse saves. This is the decision record
    * a curation pipeline audits before dropping data.
    *
    * Scale shape: clustering runs on the REP graph from
    * [[ngramJaccardGraph]] — the d²-expanded member pair set (which
    * [[ngramJaccardPairs]] must emit, because its contract is pairs) is
    * never materialized here; members inherit their rep's component label
    * by two broadcast-size joins. The one subtlety is the empty-filtered-
    * set carve-out (the q69 zero-vector analog): a text whose every
    * shingle is stop-filtered participates in NO pair — not even with its
    * byte-identical copies — so those members stay singleton clusters
    * rather than inheriting the rep label, exactly matching the transitive
    * closure of the pair output both engines compute. */
  def canonicalizeClusters(documents: DataFrame, n: Int = 3,
      minJaccard: Double = 0.2): DataFrame = {
    val g = ngramJaccardGraph(documents, n, minJaccard,
      maxDocFreqFraction = 0.5, pinShingles = true)
    val repEdges = g.repPairs
      .join(g.groups.select(col("gid").as("gid_a"), col("rid").as("doc_a")), Seq("gid_a"))
      .join(g.groups.select(col("gid").as("gid_b"), col("rid").as("doc_b")), Seq("gid_b"))
      .select("doc_a", "doc_b")
    val reps = g.groups.select(col("rid").as("doc_id"))
    val repLabels = clusterPairs(reps, repEdges)
      .select(col("doc_id").as("rid"), col("cluster_id"))
    // Rep labels are min-member ids already: each rep is its group's min
    // id, and the component label is the min rep id.
    val labels = g.members
      .join(g.groups.select(col("gid"), col("rid")), Seq("gid"))
      .join(repLabels, Seq("rid"))
      .join(g.sizes.select(col("gid"), lit(true).as("__nonempty")), Seq("gid"), "left")
      .select(col("doc_id"),
        when(col("__nonempty"), col("cluster_id")).otherwise(col("doc_id"))
          .as("cluster_id"))
    documents.select(col("doc_id"), col("n_chars"))
      .join(labels, Seq("doc_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("__total"),
        // Keep-policy as one orderable struct: max n_chars, then min id.
        min(struct((-col("n_chars")).as("__neg"), col("doc_id").as("__id")))
          .as("__best"))
      .select(col("cluster_id"), col("__best.__id").as("kept_doc_id"),
        col("n_members"), (-col("__best.__neg")).as("kept_chars"),
        (col("__total") + col("__best.__neg")).as("chars_dropped"))
      .orderBy("cluster_id")
  }

  /** Edit-distance fuzzy matching with token blocking — the entity-
    * resolution primitive: find name pairs within Levenshtein `maxDist`,
    * comparing only names that share a blocking key (here the last
    * whitespace token, the head noun of the part vocabulary). Collapses to
    * DISTINCT names first — the duplication-aware shape every near-dup
    * operator here uses — so the quadratic stage runs over the name
    * VOCABULARY (bounded by the domain's naming scheme), never over the
    * row count, and per-name multiplicities expand the result afterwards.
    *
    * Scale shape: groupBy(name) collapse, an equi-join on the block key
    * (no cartesian — the blocker IS the join key), codegen'd levenshtein
    * on the candidate pairs, and a #pairs-sized output. At 100 TB the
    * expensive O(|a|·|b|) distance runs once per distinct candidate pair,
    * not once per row pair. */
  /** Incremental NEAR-dup admission screening — the Jaccard-level form of
    * [[incrementalDedup]], and the stage a crawl pipeline runs on every
    * ingest batch: which `incoming` documents are near-duplicates (word
    * `n`-gram Jaccard ≥ `minJaccard`) of something ALREADY in the corpus?
    * Emits one row per rejected incoming document with its best existing
    * match (highest rounded Jaccard, ties to the smallest existing doc_id);
    * admitted documents simply don't appear.
    *
    * Semantics mirror [[ngramJaccardPairs]]' df-filtered universe, with the
    * document frequencies computed over the EXISTING corpus only (the
    * incoming batch must not shift the boilerplate cut between runs):
    * shingles with existing-df above `maxDocFreqFraction`·|existing| are
    * stop-filtered from BOTH sides, and per-doc set sizes count the same
    * filtered universe, so an exact re-ingested copy scores exactly 1.0.
    *
    * Scale shape — the cost is INCREMENTAL in the batch, never a corpus
    * re-pair: both sides collapse to distinct texts first (md5 content
    * groups, df weighted by existing group size, results fanned back to
    * members), candidates come from a shingle equi-join of the batch's
    * filtered shingles against the existing filtered shingle stack, and
    * the argmax is a struct-max aggregation keyed by the batch's content
    * group. At 100 TB the existing side's (shingle → gid) stack and df
    * table are the natural persisted index: each ingest run shingles only
    * its batch and equi-joins the index, exactly this plan's right half. */
  def incrementalNearDup(existing: DataFrame, incoming: DataFrame,
      n: Int = 3, minJaccard: Double = 0.8,
      maxDocFreqFraction: Double = 0.5): DataFrame =
    screenNearDups(nearDupIndex(existing, n, maxDocFreqFraction), incoming,
      n, minJaccard)

  /** The persistable screening index [[incrementalNearDup]] builds over the
    * existing corpus — exactly the four narrow relations an ingest pipeline
    * writes once and equi-joins every batch against: the stop-shingle set,
    * the filtered (shingle → content-group) stack, per-group filtered set
    * sizes, and the group → min-doc-id map. No document text survives into
    * the index. [[graft.streaming.DocumentStreams]] persists these to
    * parquet and screens a document STREAM against them. */
  private[graft] final case class NearDupIndex(stop: DataFrame,
      shingles: DataFrame, sizes: DataFrame, groups: DataFrame)

  private[graft] def nearDupIndex(existing: DataFrame, n: Int = 3,
      maxDocFreqFraction: Double = 0.5): NearDupIndex = {
    // Existing side: distinct texts, min-id representative, group size.
    val exG = existing.groupBy(md5(col("text")).as("gid"))
      .agg(count(lit(1)).as("gsz"), min(col("doc_id")).as("rid"))
    val exReps = existing.select(col("doc_id"), col("text"))
      .join(exG.select(col("rid").as("doc_id"), col("gid"), col("gsz")), Seq("doc_id"))
    // Deliberately NOT pinned: the q146 plan re-executes this shingle
    // subtree per consumer (~8 copies), but the round-13 measurement of
    // pinning it (localCheckpoint here + on fex/finc) LOST 1.6-2.2x at
    // sf0.1 — materializing the string stack costs more than re-running
    // the codegen'd explode (see ngramJaccardGraph's doc).
    val exShingles = shingled(exReps, n, extra = Seq("gid", "gsz"))
      .select(col("gid"), col("gsz"), explode(array_distinct(col("sh"))).as("sh"))
    val nEx = existing.select(count(lit(1))).first().getLong(0)
    // Stop-shingle cut by ORIGINAL existing-document frequency (sum of
    // group sizes), the same boilerplate discipline as ngramJaccardGraph —
    // expressed as the STOP set (df above the cut) and anti-joins, because
    // a batch shingle the corpus has never seen has df 0: it must stay in
    // the batch doc's denominator (novel content lowers similarity), which
    // a semi-join against the seen-and-rare set would silently drop. The
    // stop set is also the small side (boilerplate only) — broadcastable.
    val stop = exShingles.groupBy(col("sh")).agg(sum(col("gsz")).as("df"))
      .filter(col("df") > (nEx * maxDocFreqFraction).toLong)
      .select("sh")
    val fex = exShingles.select(col("sh"), col("gid"))
      .join(stop, Seq("sh"), "left_anti")
    // Sizes over the filtered universe (numerator and denominator must
    // count the same shingle population — see ngramJaccardGraph).
    val sex = fex.groupBy(col("gid")).agg(count(lit(1)).as("n_ex"))
    NearDupIndex(stop, fex, sex, exG.select(col("gid"), col("rid")))
  }

  /** Screen one incoming batch against a [[NearDupIndex]] — the per-batch
    * half of [[incrementalNearDup]]. Verdicts depend only on the index, so
    * screening a corpus in any number of batches yields the same union of
    * rejections as one call (the settle property the streaming form rides
    * on). */
  private[graft] def screenNearDups(index: NearDupIndex, incoming: DataFrame,
      n: Int, minJaccard: Double): DataFrame = {
    // Batch side: same content collapse; the stop cut is INHERITED from
    // the existing corpus, not recomputed on the batch.
    val incMembers = incoming.select(md5(col("text")).as("igid"), col("doc_id"))
    val incG = incMembers.groupBy(col("igid")).agg(min(col("doc_id")).as("irid"))
    val incReps = incoming.select(col("doc_id"), col("text"))
      .join(incG.select(col("irid").as("doc_id"), col("igid")), Seq("doc_id"))
    val finc = shingled(incReps, n, extra = Seq("igid"))
      .select(col("igid"), explode(array_distinct(col("sh"))).as("sh"))
      .join(index.stop, Seq("sh"), "left_anti")
    val sinc = finc.groupBy(col("igid")).agg(count(lit(1)).as("n_inc"))
    val cand = finc.join(index.shingles, Seq("sh"))
      .groupBy(col("igid"), col("gid")).agg(count(lit(1)).as("n_common"))
    val jac = cand.join(sinc, Seq("igid")).join(index.sizes, Seq("gid"))
      .join(index.groups, Seq("gid"))
      .withColumn("__j", col("n_common").cast("double") /
        (col("n_inc") + col("n_ex") - col("n_common")))
      .filter(col("__j") >= minJaccard)
      .withColumn("jaccard", round(col("__j"), 6))
    // Best match per incoming content group: max ROUNDED jaccard (the
    // reported value — so the argmax is float-portable), tie to the
    // smallest existing doc_id. rid is unique per content group, so the
    // struct max is total and n_common rides along deterministically.
    val best = jac.groupBy(col("igid"))
      .agg(max(struct(col("jaccard"), (-col("rid")).as("__nr"),
        col("n_common"))).as("__b"))
      .select(col("igid"), col("__b.jaccard").as("jaccard"),
        (-col("__b.__nr")).as("matched_doc"), col("__b.n_common").as("n_common"))
    incMembers.join(best, Seq("igid"))
      .select(col("doc_id"), col("matched_doc"), col("n_common"), col("jaccard"))
      .orderBy("doc_id")
  }

  def fuzzyNameMatch(part: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 1, s"need maxDist >= 1, got $maxDist")
    val names = part.groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
    val a = names.select(col("name").as("name_a"),
      col("n_parts").as("n_parts_a"), col("block"))
    val b = names.select(col("name").as("name_b"),
      col("n_parts").as("n_parts_b"), col("block"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_parts_a"), col("n_parts_b"),
        (col("n_parts_a") * col("n_parts_b")).as("n_row_pairs"))
      .orderBy("name_a", "name_b")
  }

}
