package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (SURVEY.md §2.11 X5 +
  * build-target extensions): per-language corpus stats, per-document token
  * stats, quality scoring, content fingerprinting, and a data-driven
  * language identifier. Everything is built from codegen'd builtins and
  * higher-order array functions — no Scala UDFs on the hot path, so plans
  * stay inside whole-stage codegen and scale linearly.
  */
object TextOps {

  /** [[perDistinctContent]]'s duplication-probe memo: (canonicalized-plan
    * digest, key columns) → (rows, approx distinct). The key is the MD5 of
    * the canonicalized LogicalPlan's string form — 128 bits, so two
    * distinct corpora colliding into a shared verdict is negligible (the
    * round-7 worry was a 32-bit hash), while holding NO reference to the
    * plan tree itself: foreachBatch micro-batch plans (LogicalRDD) carry
    * RDD lineage, and 256 strongly-held trees would delay ContextCleaner
    * shuffle/block cleanup in long-running streams. LRU with capacity 256
    * (access-order LinkedHashMap, eldest evicted) — a sweep evicts only
    * the coldest corpus, never the hot ones mid-pipeline. Staleness after
    * an external overwrite of the same path can only flip a plan choice
    * between two exact routes. */
  private val ProbeCacheCap = 256
  private val probeCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, List[String]), (Long, Long)](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, List[String]), (Long, Long)]): Boolean =
        size() > ProbeCacheCap
    })

  private def planDigest(docs: DataFrame): String = {
    // toString alone is NOT data-inclusive: a LocalRelation prints only its
    // schema, so two in-memory frames with the same shape but different
    // rows would collide and serve each other's probe verdict. semanticHash
    // (the canonicalized tree's hashCode) folds LocalRelation data in;
    // file-backed plans carry their paths in the string either way.
    val canonical = docs.queryExecution.analyzed.canonicalized.toString() +
      "#" + docs.queryExecution.analyzed.semanticHash()
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Is this corpus duplicated enough for a content collapse to pay for
    * its fixed tax (distinct aggregate + fan-out joins)? One cheap probe
    * aggregate — count + approx_count_distinct over an xxhash64 of the
    * key columns (codegen'd, map-side HLL sketch, no shuffle beyond one
    * sketch per partition) — memoized per (canonicalized plan, keys) so a
    * pipeline running many operators over the same corpus pays the probe
    * scan once per JVM. Any staleness in the memo only nudges a plan
    * choice between two exact routes, never a result.
    *
    * The probe is an EAGER action at operator-construction time, so a
    * STREAMING frame (which cannot run batch actions) short-circuits to
    * `false` — the direct route, which is streaming-safe. Inside
    * `foreachBatch` the per-batch frame is a batch DataFrame and probes
    * normally. */
  private[graft] def duplicationHeavy(docs: DataFrame, keyCols: Seq[String],
      minDupFraction: Double = 0.10): Boolean = {
    if (docs.isStreaming) return false
    val cacheKey = (planDigest(docs), keyCols.toList)
    // computeIfAbsent under the map's own lock: get-then-put would let two
    // threads probing the same cold corpus both pay the probe and interleave
    // the LRU access order (benign today — bench/verify are serial — but a
    // concurrent streaming pipeline shouldn't probe twice). The probe is a
    // sub-second scan, so holding the lock across it is acceptable; a
    // same-key concurrent caller must wait for the value anyway, and
    // other-key callers only queue behind it during the one cold probe per
    // (corpus, keys) per JVM.
    val (nRows, nDistinct) = probeCache.synchronized {
      Option(probeCache.get(cacheKey)).getOrElse {
        val probe = docs
          .agg(count(lit(1)).as("__n"),
            approx_count_distinct(xxhash64(keyCols.map(col): _*)).as("__d"))
          .first()
        val v = (probe.getLong(0), probe.getLong(1))
        probeCache.put(cacheKey, v)
        v
      }
    }
    nRows > 0 && nDistinct.toDouble / nRows < 1.0 - minDupFraction
  }

  /** (members, reps) of the gsz-WEIGHTED content collapse used by the
    * corpus-count operators ([[bigramQuality]], [[duplicatedSpans]],
    * [[exactSubstrScrub]]) — ops whose result depends on corpus-wide
    * occurrence counts, so the collapse must carry each distinct text's
    * copy count (`gsz`) into every aggregate rather than fan rows back
    * unweighted (the [[perDistinctContent]] shape). Routed by the same
    * duplication probe: on a ~unique corpus the collapse is an identity —
    * gid = doc_id, gsz = 1, no distinct, no join — so low-duplication
    * corpora skip the fixed tax while the weighted math stays literally
    * the same expression on both routes.
    *
    * members: (gid, doc_id) — one row per input doc.
    * reps: (gid, gsz, text) — one row per distinct text (or per doc on
    * the bypass route), gsz = number of byte-identical copies. */
  private def contentGroups(docs: DataFrame): (DataFrame, DataFrame) =
    if (duplicationHeavy(docs, Seq("text"))) {
      val members = docs.select(md5(col("text")).as("gid"), col("doc_id"))
      val groups = members.groupBy(col("gid")).agg(count(lit(1)).as("gsz"))
      // One representative text per content group (all rows in a gid are
      // byte-identical, so "first" is deterministic in value).
      val reps = docs
        .select(md5(col("text")).as("gid"), col("text"))
        .dropDuplicates("gid")
        .join(groups, Seq("gid"))
        .select(col("gid"), col("gsz"), col("text"))
      (members, reps)
    } else {
      (docs.select(col("doc_id").cast("string").as("gid"), col("doc_id")),
        docs.select(col("doc_id").cast("string").as("gid"),
          lit(1L).as("gsz"), col("text")))
    }

  /** Whitespace tokenizer as a Column expression. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-style pre-tokenization pattern (the GPT-2 pretokenizer family):
    * common English contractions, space-prefixed letter runs, space-prefixed
    * digit runs, space-prefixed punctuation runs, residual whitespace.
    * Restricted to the RE2-compatible subset (no lookahead), so the exact
    * same pattern runs in Spark (java.util.regex) and DuckDB (RE2) with
    * identical leftmost-first alternation semantics — oracle-comparable. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish tokenizer: every non-overlapping match of [[BpePattern]], in
    * order. Token COUNT under this scheme approximates LLM-tokenizer counts
    * far better than whitespace splitting (punctuation and contractions
    * count separately), which is what byte-budget curation actually needs. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Per-document token budget under both tokenizations: whitespace words
    * vs BPE-ish pieces, plus their ratio (pieces per word — a cheap
    * "tokenizer inflation" quality signal: prose sits near 1, code and
    * punctuation-heavy text inflate). One codegen'd pass, no explode.
    * Content-collapsed ([[perDistinctContent]]): the two regex
    * tokenizations — the entire cost — run once per distinct text. */
  def bpeTokenStats(documents: DataFrame): DataFrame =
    perDistinctContent(documents, Seq("text")) { reps =>
      reps.select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        size(bpeTokens(col("text"))).as("n_bpe_tokens"))
        .withColumn("bpe_per_word",
          round(col("n_bpe_tokens").cast("double") / col("n_ws_tokens"), 6))
    }.orderBy("doc_id")

  val StopWords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** RAG-style sliding-window chunking: split each document into token
    * windows of `chunkSize` with `overlap` tokens shared between adjacent
    * chunks (stride = chunkSize − overlap). Chunk i covers token positions
    * [i·stride + 1, i·stride + chunkSize]; the final chunk is allowed to be
    * short, and a document never yields zero chunks. Retrieval-index
    * ingestion at corpus scale is exactly this shape: map-only (one
    * higher-order transform + posexplode per row, token array bound once —
    * same O(words) binding discipline as [[graft.dedup.Dedup]] shingling),
    * no shuffle until the caller aggregates, output ~n_tokens/stride rows
    * per document. */
  def chunkDocuments(documents: DataFrame, chunkSize: Int = 32, overlap: Int = 8): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val nChunks = greatest(lit(1),
      ceil((size(col("__toks")) - lit(overlap)).cast("double") / stride).cast("int"))
    graft.ops.Partitioning.spread(documents)
      .select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("__toks"), nChunks.as("__n"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("__n") - 1),
          i => concat_ws(" ", slice(col("__toks"), i * stride + 1, lit(chunkSize))))))
      .toDF("doc_id", "chunk_id", "chunk_text")
      .withColumn("n_chunk_tokens", size(tokens(col("chunk_text"))))
      .orderBy("doc_id", "chunk_id")
  }

  /** Canonical text form for normalization-invariant dedup: lowercase, every
    * non-alphanumeric run collapsed to a single space, trimmed. The pattern
    * is RE2-compatible (no lookaround), so the identical regex runs in the
    * DuckDB oracle. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^\\p{L}\\p{N}]+", " "))

  /** Normalization-invariant exact dedup: groups documents whose texts are
    * equal after [[normalizeText]] — catching case/punctuation/whitespace
    * variants that byte-exact hashing ([[graft.dedup.Dedup.exactDedup]])
    * treats as distinct. Same scale shape as exact dedup: the shuffle key is
    * the 32-byte hash of the canonical form, never the document body.
    * `n_exact_variants` counts distinct raw texts inside each group (1 ⇒
    * normalization added nothing; >1 ⇒ genuine near-miss duplicates). */
  def normalizedDedup(documents: DataFrame): DataFrame =
    documents
      .groupBy(sha2(normalizeText(col("text")), 256).as("norm_hash"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(sha2(col("text"), 256)).as("n_exact_variants"))
      .select("doc_id", "norm_hash", "n_copies", "n_exact_variants")
      .orderBy("doc_id")

  /** Corpus stats per language: doc count, char totals/averages, word
    * totals, distinct sources. One hash aggregation. */
  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(size(tokens(col("text")))).as("total_words"),
        countDistinct(col("source")).as("n_sources"))
      .withColumn("avg_chars", col("total_chars").cast("double") / col("n_docs"))
      .orderBy("lang")

  /** Run a content-pure per-document transform once per DISTINCT content
    * key and fan its rows back to every member doc_id — the generic form
    * of the duplication collapse the pair-emitting operators
    * ([[graft.dedup.Dedup.ngramJaccardPairs]], [[exactSubstrScrub]],
    * [[duplicatedSpans]]) already use. Real corpora carry 30-50% exact
    * duplication (replicated boilerplate, mirrored pages); a per-document
    * map cost (tokenize, shingle, score) paid once per distinct text
    * instead of once per copy cuts the heavy stage by the duplication
    * factor, while the fan-out join ships only (gid, doc_id) pairs and
    * the rep-sized result.
    *
    * Contract: `f` must read ONLY columns covered by `keyCols` (plus
    * doc_id, which it must propagate to its output) — anything else would
    * make the collapsed answer depend on which copy became the
    * representative. Representatives are deterministic (min doc_id per
    * key), so reruns and plan retries agree.
    *
    * The collapse pays a fixed tax — a distinct aggregate plus two
    * fan-out joins — that only the duplicated fraction repays; on a
    * ~unique corpus it is pure overhead (measured ~2-3× on the 0.2%-dup
    * sf0.1 fixture). So the routing is data-driven: one cheap probe
    * aggregate (count + approx_count_distinct over the content key — a
    * map-side HLL sketch, no expand, no shuffle beyond one sketch per
    * partition) measures the duplication rate, and corpora below
    * `minDupFraction` run `f` directly. The probe reads only `keyCols`,
    * so its scan is column-pruned; its cost is one pass over the key
    * bytes, repaid whenever either branch is the right one. HLL's ±2.3%
    * default error only matters within a band around the threshold where
    * the two branches' costs cross anyway — both routes are correct,
    * the probe only picks the cheaper plan. */
  def perDistinctContent(docs: DataFrame, keyCols: Seq[String],
      minDupFraction: Double = 0.10)(
      f: DataFrame => DataFrame): DataFrame = {
    require(keyCols.nonEmpty, "perDistinctContent needs at least one key column")
    // JSON-encoded struct key: field names + quoting make the encoding
    // injective -- NULL, empty string, and separator-shifted values all
    // hash differently (a separator concat would silently alias NULL text
    // with empty text, and (NULL,"x") with ("x",NULL), because concat_ws
    // skips NULLs -- aliased docs would inherit another content's
    // results). ignoreNullFields=false keeps an explicit null token.
    val gid = md5(to_json(struct(keyCols.map(col): _*),
      Map("ignoreNullFields" -> "false")))
    // The probe hashes with xxhash64 (codegen'd, no JSON round-trip) —
    // aliasing on exotic null layouts only nudges a plan choice, never a
    // result — and is memoized per (canonicalized plan, keys): a pipeline
    // running many operators over the same corpus pays the probe scan
    // once per JVM, not once per operator. A stale hit after an external
    // overwrite of the same path again only picks a plan; both routes are
    // exact.
    if (!duplicationHeavy(docs, keyCols, minDupFraction))
      return f(docs)
    val withGid = docs.withColumn("__gid", gid)
    val members = withGid.select(col("__gid"), col("doc_id").as("__member_id"))
    val repIds = withGid.groupBy(col("__gid")).agg(min(col("doc_id")).as("doc_id"))
    val reps = withGid.join(repIds, Seq("__gid", "doc_id"))
    val repMap = reps.select(col("__gid"), col("doc_id").as("__rep_id"))
    val out = f(reps.drop("__gid"))
    require(out.columns.contains("doc_id"),
      "perDistinctContent: f's output must carry doc_id")
    val outCols = out.columns.toSeq
    out.join(repMap, out("doc_id") === repMap("__rep_id"))
      .join(members, Seq("__gid"))
      .select(outCols.map {
        case "doc_id" => col("__member_id").as("doc_id")
        case c => col(c)
      }: _*)
  }

  /** Per-document token stats: counts, distinct counts, longest token.
    * Content-collapsed ([[perDistinctContent]]): tokenization runs once
    * per distinct text. */
  def tokenStats(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    perDistinctContent(documents, Seq("text")) { reps =>
      reps.select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct_tokens"),
        array_max(transform(toks, t => length(t))).as("max_token_len"),
        length(col("text")).as("text_len"))
    }.orderBy("doc_id")
  }

  /** Per-source heavy hitters: the `k` most frequent tokens of every
    * source, with deterministic (count desc, token asc) tie-breaks — the
    * vocabulary-drift / boilerplate-detection readout of corpus curation
    * (a source whose top tokens are markup is a source to re-filter).
    *
    * Scale shape: explode → hash-aggregate benefits from map-side partial
    * aggregation (the doc_id×token blowup collapses to (source, token)
    * partials before the exchange), and the rank window's
    * `row_number ≤ k` filter is pushed into a WindowGroupLimit, so each
    * partition forwards only k candidates per source rather than the whole
    * per-source vocabulary. */
  def topTokensPerSource(documents: DataFrame, k: Int = 5): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(desc("n"), col("token"))
    graft.ops.Partitioning.spread(documents)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("n"))
      .withColumn("token_rank", row_number().over(w))
      .filter(col("token_rank") <= k)
      .orderBy("source", "token_rank")
  }

  /** Sketch-based per-source heavy hitters — the 100 TB path for
    * [[topTokensPerSource]]: one `approx_top_k` aggregate per source keeps
    * a BOUNDED frequency sketch (`maxItemsTracked` counters) as group
    * state, so neither the per-source vocabulary aggregate nor its rank
    * window ever materializes — the exchange carries one sketch per
    * (partition × source) instead of the full (source, token) space, and
    * merge is associative (same mergeable-summary discipline as
    * [[graft.ops.Sketches]]). Estimated counts are exact whenever a
    * source's distinct tokens fit inside `maxItemsTracked` (the sketch
    * never saturates); beyond that they are upper-bound estimates with the
    * usual space-saving guarantees.
    *
    * Which items the sketch returns at a TIED boundary count is
    * unspecified, so `fetchSlack` extra items are pulled from it and the
    * deterministic (count desc, token asc) re-rank cuts back to `k` — the
    * emitted rows then match the exact form whenever every token counting
    * at least the k-th boundary count fits in `k + fetchSlack`. */
  def approxTopTokensPerSource(documents: DataFrame, k: Int = 5,
      maxItemsTracked: Int = 10000, fetchSlack: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    require(fetchSlack >= 0, "fetchSlack must be non-negative")
    graft.ops.Partitioning.spread(documents)
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("source"))
      .agg(expr(s"approx_top_k(token, ${k + fetchSlack}, $maxItemsTracked)").as("__top"))
      .select(col("source"), explode(col("__top")).as("t"))
      .select(col("source"), col("t.item").as("token"), col("t.count").as("n"))
      .withColumn("token_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(desc("n"), col("token"))))
      .filter(col("token_rank") <= k)
      .orderBy("source", "token_rank")
  }

  /** Quality scoring: length band, stopword ratio, lexical diversity — the
    * standard cheap filters applied before expensive pipeline stages. */
  def qualityScore(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val stops = array(StopWords.map(lit): _*)
    // Key includes lang — the output carries it, so two same-text docs
    // tagged differently must not share a representative.
    perDistinctContent(documents, Seq("text", "lang")) { reps =>
      reps.select(
        col("doc_id"),
        col("lang"),
        size(toks).as("n_words"),
        size(filter(toks, t => array_contains(stops, t))).as("n_stopwords"))
        .withColumn("stopword_ratio", col("n_stopwords").cast("double") / col("n_words"))
        .withColumn("length_ok", col("n_words") >= 10 && col("n_words") <= 10000)
    }.orderBy("doc_id")
  }

  /** Longest run of equal consecutive elements in a string array, as a
    * single higher-order `aggregate` — no explode, no shuffle, stays in
    * whole-stage codegen. Empty arrays yield 0. */
  private def maxRun(arr: Column): Column =
    aggregate(arr,
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev").isNotNull && x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Repetition quality signals (the Gopher/MassiveText family of filters):
    * per document, the duplicate-token fraction, the longest consecutive
    * same-token run, and the frequency of the most common word `n`-gram —
    * excessive repetition is the strongest cheap predictor of degenerate or
    * boilerplate text in pretraining corpora.
    *
    * Scale shape: entirely MAP-ONLY. The classic formulation (explode
    * n-grams, groupBy (doc, gram), max count per doc) shuffles the whole
    * exploded corpus; here the top-gram count is instead computed per row
    * as the longest equal-run of the SORTED n-gram array ([[maxRun]] over
    * `array_sort` — sorting groups equal grams, so the longest run IS the
    * top gram's count), and the token-run signal is [[maxRun]] over the raw
    * token array. No shuffle anywhere until the final presentation sort. */
  def repetitionSignals(documents: DataFrame, n: Int = 2): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val toks = col("__toks")
    val grams =
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
    perDistinctContent(documents, Seq("text")) { docs =>
      graft.ops.Partitioning.spread(docs)
        .select(col("doc_id"), tokens(col("text")).as("__toks"))
        .select(col("doc_id"), toks, grams.as("__grams"))
        .select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          round(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks), 6)
            .as("dup_token_frac"),
          maxRun(toks).as("max_token_run"),
          maxRun(array_sort(col("__grams"))).as("top_ngram_count"),
          size(col("__grams")).as("__n_grams"))
        .withColumn("top_ngram_frac",
          round(when(col("__n_grams") > 0,
            col("top_ngram_count").cast("double") / col("__n_grams"))
            .otherwise(lit(0.0)), 6))
        .drop("__n_grams")
    }.orderBy("doc_id")
  }

  /** Content fingerprints: full SHA-256 plus a prefix SHA-256 (first 64
    * chars) — join keys for exact dedup and cheap prefix-level blocking.
    * (A 64-bit xxHash variant lives in [[simHash]]'s token hashing.) */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      sha2(col("text"), 256).as("sha256_hex"),
      sha2(substring(col("text"), 1, 64), 256).as("prefix_sha256"))
      .orderBy("doc_id")

  /** Winnowing fingerprints (the rolling-hash document fingerprint of
    * Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the scheme behind MOSS):
    * hash every `k`-char gram, then in every window of `window` consecutive
    * gram hashes keep the minimum; the per-document fingerprint set is the
    * distinct kept hashes. Guarantee: any substring match of length ≥
    * `window + k − 1` chars yields at least one SHARED fingerprint, so
    * partial-overlap/containment near-dups (which whole-document hashing
    * and token-set Jaccard both miss) surface as fingerprint joins.
    *
    * Shape: map-only — per row two higher-order transforms (gram hashing,
    * windowed min) and an explode; no shuffle until whatever aggregation
    * the caller adds. Output: one (doc_id, fingerprint) row per kept hash.
    */
  def winnowingFingerprints(documents: DataFrame, k: Int = 8, window: Int = 4): DataFrame = {
    val text = col("text")
    val nGrams = greatest(length(text) - (k - 1), lit(1))
    val gramHashes =
      transform(sequence(lit(1), nGrams), i => xxhash64(text.substr(i, lit(k))))
    val withH = graft.ops.Partitioning.spread(documents)
      .select(col("doc_id"), gramHashes.as("__h"))
    val nWindows = greatest(size(col("__h")) - (window - 1), lit(1))
    withH.select(
      col("doc_id"),
      explode(array_distinct(
        transform(sequence(lit(1), nWindows),
          j => array_min(slice(col("__h"), j, lit(window)))))).as("fingerprint"))
  }

  /** Per-document winnowing summary (deterministic: one row per doc).
    * Content-collapsed ([[perDistinctContent]]): the gram hashing and
    * windowed mins — the dominant map cost — run once per distinct text. */
  def winnowingStats(documents: DataFrame, k: Int = 8, window: Int = 4): DataFrame =
    perDistinctContent(documents, Seq("text")) { reps =>
      winnowingFingerprints(reps, k, window)
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_fingerprints"),
          min(col("fingerprint")).as("min_fingerprint"),
          max(col("fingerprint")).as("max_fingerprint"))
    }.orderBy("doc_id")

  /** Fingerprint-overlap near-dup candidates: documents sharing ≥
    * `minShared` winnowing fingerprints. Blocking is the fingerprint
    * equi-join itself; fingerprints present in more than `maxDocFreq`
    * documents are dropped first (boilerplate killer — same skew guard as
    * the stop-shingle filter in [[graft.dedup.Dedup.ngramJaccardPairs]]),
    * so no bucket degenerates toward all-pairs at corpus scale. */
  def winnowingNearDups(documents: DataFrame, k: Int = 8, window: Int = 4,
      minShared: Int = 2, maxDocFreq: Int = 100): DataFrame = {
    val fps = winnowingFingerprints(documents, k, window)
    val rare = fps.groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("fingerprint")
    val filtered = fps.join(rare, Seq("fingerprint"))
    val a = filtered.select(col("fingerprint"), col("doc_id").as("doc_a"))
    val b = filtered.select(col("fingerprint"), col("doc_id").as("doc_b"))
    a.join(b, Seq("fingerprint"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash per document: hash every token with xxhash64, then for
    * each of 64 bit positions take the sign of Σ(±1). Near-duplicate texts
    * land within small Hamming distance. Implemented as explode → 64 partial
    * sums → bit reassembly: one shuffle keyed by doc_id, no UDF state.
    */
  def simHash(documents: DataFrame): DataFrame =
    simHashWithLen(documents).select("doc_id", "simhash").orderBy("doc_id")

  /** SimHash plus token count in ONE aggregation — the count rides the same
    * groupBy that folds the bit sums, so length blocking below costs no
    * extra pass. */
  private def simHashWithLen(documents: DataFrame): DataFrame = {
    val tokenHashes = graft.ops.Partitioning.spread(documents)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    } :+ count(lit(1)).as("n_tokens")
    val agg = tokenHashes.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    agg.select(col("doc_id"), sim.as("simhash"), col("n_tokens"))
  }

  /** SimHash near-dup candidate pairs within Hamming distance `maxHamming`.
    *
    * Blocking key = (band, band_val, length_bucket):
    *  - 4 × 16-bit bands — any pair within Hamming ≤ 3 shares at least one
    *    exact band (pigeonhole), so candidates come from equi-joins, never
    *    a cross join;
    *  - a token-count bucket (`lengthBucketSize`, 0 disables) widens the key
    *    beyond the 16 band bits: at billions of docs a bare 16-bit band
    *    holds ~N/65536 docs and the in-bucket join goes quadratic, while
    *    band × length splits it by the corpus' length distribution. Side A
    *    emits its bucket AND both neighbors, so any pair whose token counts
    *    differ by < lengthBucketSize is still guaranteed to collide —
    *    near-dups at Hamming ≤ 3 are in practice near-identical in length,
    *    and the bound makes the heuristic explicit. */
  def simHashNearDups(documents: DataFrame, maxHamming: Int = 3,
      lengthBucketSize: Int = 64): DataFrame = {
    // A negative bound is meaningless ("closer than identical") and the two
    // routes would disagree on it: the band join returns nothing, while the
    // collapsed route's intra-group expansion emits its hamming-0 copy
    // pairs unconditionally. Refuse rather than pick a side silently.
    require(maxHamming >= 0, s"need maxHamming >= 0, got $maxHamming")
    if (duplicationHeavy(documents, Seq("text"))) {
      // CONTENT COLLAPSE (the duplication-aware shape every near-dup
      // operator here uses, probed data-driven): byte-identical copies
      // have identical simhash AND identical n_tokens, so on a replicated
      // corpus the direct route re-tokenizes every copy and its band
      // buckets hold d copies of every doc — the candidate join does d²
      // the work for the same distinct verdicts. Collapse to distinct
      // texts first: tokenize + band-join once per distinct text, then
      // expand group pairs to member pairs (cross-group pairs keep their
      // group hamming; intra-group pairs are exact copies — hamming 0 —
      // emitted by a gid equi-self-join, output-sized, no band pass).
      val keyed = documents.select(md5(col("text")).as("gid"),
        col("doc_id"), col("text"))
      val members = keyed.select(col("gid"), col("doc_id"))
      val reps = keyed.select(col("gid").as("doc_id"), col("text"))
        .dropDuplicates("doc_id")
      val gp = simHashBandPairs(
        simHashWithLen(reps).localCheckpoint(), maxHamming, lengthBucketSize)
      val cross = gp
        .join(members.select(col("gid").as("doc_a"), col("doc_id").as("__da")),
          Seq("doc_a"))
        .join(members.select(col("gid").as("doc_b"), col("doc_id").as("__db")),
          Seq("doc_b"))
        .select(least(col("__da"), col("__db")).as("doc_a"),
          greatest(col("__da"), col("__db")).as("doc_b"), col("hamming"))
      val intra = members.as("x")
        .join(members.as("y"), col("x.gid") === col("y.gid") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          lit(0).as("hamming"))
      cross.union(intra).orderBy("doc_a", "doc_b")
    } else {
      simHashBandPairs(
        // localCheckpoint: materialized once, consumed by both join sides;
        // blocks are released by the ContextCleaner when the frame is
        // dropped (the round-1 cache() was never unpersisted).
        simHashWithLen(documents).localCheckpoint(), maxHamming, lengthBucketSize)
        .orderBy("doc_a", "doc_b")
    }
  }

  /** The banded candidate join over a (doc_id, simhash, n_tokens) frame —
    * shared by both [[simHashNearDups]] routes (ids are doc ids on the
    * direct route, content-group ids on the collapsed one; the logic is
    * id-type-agnostic). Returns (doc_a < doc_b, hamming ≤ maxHamming),
    * deduped across the 4 band collisions. */
  private def simHashBandPairs(sh: DataFrame, maxHamming: Int,
      lengthBucketSize: Int): DataFrame = {
    val lb: org.apache.spark.sql.Column =
      if (lengthBucketSize > 0) floor(col("n_tokens") / lengthBucketSize) else lit(0L)
    val bands = (0 until 4).map { b =>
      sh.select(
        col("doc_id"),
        col("simhash"),
        lb.as("len_bucket"),
        lit(b).as("band"),
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("band_val"))
    }.reduce(_ union _)
    val a = bands.select(
        col("band"), col("band_val"),
        explode(array(col("len_bucket") - 1, col("len_bucket"), col("len_bucket") + 1)).as("len_bucket"),
        col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = bands.select(col("band"), col("band_val"), col("len_bucket"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    val ham = bit_count(col("sim_a").bitwiseXOR(col("sim_b")))
    a.join(b, Seq("band", "band_val", "len_bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), ham.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Data-driven language identification: build per-language token profiles
    * (the top-N most frequent tokens per language by document frequency),
    * then score each document by profile overlap and predict the argmax.
    *
    * The profile is bounded (languages × N tokens) so it broadcasts; scoring
    * is an explode + broadcast join + argmax — no driver-side loops over
    * data rows. `labelled` provides the training corpus (here the same
    * table; in production a held-out labelled set).
    *
    * Weights are INTEGER rank weights (`topN + 1 − rank`, linear decay):
    * integer sums are exact in any engine, so scores — and therefore the
    * argmax — are bit-identical cross-engine and the whole operator is
    * oracle-checkable (harmonic 1/rank float weights would make near-tie
    * ordering depend on accumulation order). All ordering ties break
    * deterministically (token asc in the profile, language asc in the
    * argmax). */
  def languageId(documents: DataFrame, labelled: DataFrame, topN: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokenFreq = graft.ops.Partitioning.spread(labelled)
      .select(col("lang"), explode(array_distinct(tokens(col("text")))).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("lang")).orderBy(desc("df"), col("tok"))
    val profile = tokenFreq
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("lang").as("profile_lang"), col("tok"),
        (lit(topN + 1) - col("rank")).cast("long").as("weight"))
    val docTokens = graft.ops.Partitioning.spread(documents)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("tok"))
    val scored = docTokens
      .join(broadcast(profile), Seq("tok"))
      .groupBy(col("doc_id"), col("lang"), col("profile_lang"))
      .agg(sum(col("weight")).as("score"))
    val pick = Window.partitionBy(col("doc_id")).orderBy(desc("score"), col("profile_lang"))
    scored
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        col("lang").as("actual_lang"),
        col("profile_lang").as("predicted_lang"),
        (col("lang") === col("profile_lang")).as("correct"))
      .orderBy("doc_id")
  }

  /** Corpus-LM quality signal without floats: score each document by how
    * typical its word bigrams are of the corpus (the integer-exact stand-in
    * for n-gram-LM perplexity filtering, the CCNet/Gopher quality-pipeline
    * step — docs whose transitions are rare in the corpus are
    * boilerplate-mangled or noise; docs of only ultra-common transitions
    * are templates).
    *
    * Each bigram's corpus frequency `c` is collapsed to its frequency
    * class `floor(log2 c)` = `length(bin(c)) - 1` — exact integer
    * arithmetic, so per-doc sums are order-independent and the result is
    * hash-comparable against the oracle with no float tolerance (the same
    * trick as the integer-weight language-id profile above).
    *
    * Shape: one projection builds the bigram list (map-side, no shuffle),
    * one shuffle keys by bigram for the count window, one shuffle
    * re-aggregates per doc. The count-over-window avoids a second scan +
    * join against a separate counts table; heavy-hitter bigrams land one
    * partition per bigram — at 100 TB swap the window for groupBy counts +
    * a broadcast of the (bounded) heavy-hitter subset, or let AQE skew
    * handling split the partition. */
  def bigramQuality(docs: DataFrame): DataFrame = {
    // Duplication-aware (the q91 shape — content-pure signal over
    // corpus-wide counts): bigrams explode once per DISTINCT text,
    // corpus frequency = per-rep occurrences × copies (the same integers
    // the all-docs count window produced), the per-bigram count is a
    // partial-aggregated groupBy instead of a window over every row, and
    // members fan back out at the end. Probe-routed ([[contentGroups]]):
    // ~unique corpora skip the collapse.
    val (members, reps) = contentGroups(docs)
    val repBi = reps
      .select(col("gid"), col("gsz"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("gid"), col("gsz"),
        explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
          .as("bigram"))
    val counts = repBi.groupBy(col("bigram")).agg(sum(col("gsz")).as("__c"))
    val perRep = repBi
      .join(counts, Seq("bigram"))
      .withColumn("freq_class", (length(bin(col("__c"))) - 1).cast("int"))
      .groupBy(col("gid"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("freq_class")).as("sum_freq_class"),
        min(col("freq_class")).as("min_freq_class"))
    members.join(perRep, Seq("gid"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_freq_class"),
        col("min_freq_class"))
      .orderBy("doc_id")
  }

  /** Duplicated-span fraction — the exact-substring-duplication signal
    * (the suffix-array dedup family, approximated at n-gram granularity):
    * what fraction of a document's n-token spans occur anywhere else in
    * the corpus (including its own other positions)? High fractions mark
    * boilerplate/templated text that pairwise near-dup scoring (q28/q30)
    * misses when no single partner document is similar overall.
    *
    * Duplication-aware (the [[exactSubstrScrub]] collapse — round 6; the
    * naive form was the heaviest non-ML wall at sf10): the report is a
    * pure function of document CONTENT plus corpus-wide span counts, so
    * exact duplicates collapse to one representative before shingling and
    * the count for span s is Σ occurrences(rep) × copies(rep) — the same
    * integer the all-docs count window would produce. The per-span count
    * is a partial-aggregated groupBy (map-side combine BEFORE the
    * shuffle, which the count-window formulation could never do) joined
    * back to the d×-smaller rep span frame; members fan back out at the
    * end. Deterministic: counts are integers; the fraction is a
    * small-integer ratio rounded to fixed precision. */
  def duplicatedSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val (members, reps) = contentGroups(docs)
    val repSpans = reps
      .select(col("gid"), col("gsz"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("gid"), col("gsz"), explode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))"))
        .as("span"))
    val counts = repSpans.groupBy(col("span")).agg(sum(col("gsz")).as("__c"))
    val perRep = repSpans
      .join(counts, Seq("span"))
      .groupBy(col("gid"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("__c") > 1, 1).otherwise(0)).as("n_dup_spans"))
    members.join(perRep, Seq("gid"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6)
          .as("dup_fraction"))
      .orderBy("doc_id")
  }

  /** Exact-substring scrubbing — the REMOVAL half of the suffix-array
    * dedup family ([[duplicatedSpans]] is the reporting half): every token
    * covered by an n-token span that occurs more than once ANYWHERE in the
    * corpus (other documents or the same one) is dropped, and each
    * document's surviving tokens are stitched back in order. This is the
    * standard "dedup the training data, not the documents" pass: it kills
    * boilerplate and templated fragments that pairwise near-dup scoring
    * can't, because no single partner document is similar overall.
    *
    * Scale shape: shingling is map-side; duplicated spans come from ONE
    * groupBy keyed by span; coverage expansion is a bounded explode (≤ n
    * positions per duplicated span occurrence); the anti-join and the
    * re-assembly are keyed by (gid, pos) / gid. No window over an
    * unbounded frame, no driver state — every stage is an equi-keyed
    * shuffle that partitions with the data. Re-assembly materializes each
    * doc's token list once (`collect_list` within its own group —
    * per-doc bounded, the same bound the input row already carries).
    * Deterministic: positions are integers, the rebuilt string is the
    * position-sorted join.
    *
    * Duplication-aware (same collapse/expand as
    * [[graft.dedup.Dedup.ngramJaccardPairs]]): the scrub verdict is a pure
    * function of document CONTENT plus corpus-wide span counts, so exact
    * duplicates collapse to one representative text (md5 content groups)
    * before shingling, and the whole span → coverage → rebuild pipeline
    * runs once per DISTINCT text. Span counts are weighted by group size
    * (`sum(gsz)`, not `count(*)`), so a span the naive all-docs pass would
    * see d times — once per byte-identical copy — still counts d here and
    * crosses the >1 bar identically; the rebuilt text then fans back out
    * to every member doc_id. Output is row-identical to the naive pass
    * (the q121 oracle runs on all docs), but span explosion, coverage
    * dedup and string re-assembly cost scales with UNIQUE text volume: on
    * a corpus with duplication factor d (30-50% on web crawls; d=10..100
    * in the adversarial sf1..sf10 sweeps) the heavy stages shrink d×. */
  def exactSubstrScrub(docs: DataFrame, n: Int = 8): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    val (members, reps) = contentGroups(docs)
    val repToks = reps
      .select(col("gid"), col("gsz"), tokens(col("text")).as("toks"))
    val spans = repToks
      .filter(size(col("toks")) >= n)
      .select(col("gid"), col("gsz"), posexplode(expr(
        s"transform(sequence(0, size(toks) - $n), i -> concat_ws(' ', slice(toks, i + 1, $n)))")))
      .toDF("gid", "gsz", "pos", "span")
    // Corpus-wide occurrence count = per-rep occurrences × copies.
    val dupSpans = spans
      .groupBy(col("span"))
      .agg(sum(col("gsz")).as("__c"))
      .filter(col("__c") > 1)
      .select(col("span"))
    val covered = spans
      .join(dupSpans, Seq("span"))
      .select(col("gid"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("pos"))
      .distinct()
    val kept = repToks
      .select(col("gid"), posexplode(col("toks")))
      .toDF("gid", "pos", "tok")
      .join(covered, Seq("gid", "pos"), "left_anti")
    val rebuilt = kept
      .groupBy(col("gid"))
      .agg(count(lit(1)).as("__n_kept"),
        array_join(expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"),
          " ").as("cleaned"))
    val perGroup = repToks
      .select(col("gid"), size(col("toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("gid"), "left")
      .select(col("gid"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned_text"))
    members
      .join(perGroup, Seq("gid"))
      .select(col("doc_id"), col("n_tokens"), col("n_removed"), col("cleaned_text"))
      .orderBy("doc_id")
  }

  /** Cross-source lexical-similarity matrix — mixture governance: for
    * every pair of sources, the Jaccard overlap of their distinct-token
    * vocabularies. Sources that are lexical near-clones double-count in a
    * training mixture; a source with a disjoint vocabulary is the one
    * adding diversity ([[graft.ops.Curation]] budget design input).
    *
    * Scale shape: per-source vocabularies are one explode + distinct
    * (shuffle keyed by token — bounded by vocabulary, not corpus size);
    * the pair join is over that same token-keyed set, and the #sources²
    * output is catalog-sized at any corpus scale. Only overlapping pairs
    * appear. */
  def vocabularyOverlap(documents: DataFrame): DataFrame = {
    val vocab = documents
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .distinct()
    val sizes = vocab.groupBy("source").agg(count(lit(1)).as("n"))
    val shared = vocab.as("a")
      .join(vocab.as("b"), col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("n_a"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("n_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("shared"),
        round(col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")), 6)
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Bigram PMI collocations — the classic corpus-analysis association
    * measure (and the signal behind phrase-vocabulary induction):
    * `pmi(w1,w2) = ln(P(w1,w2) / (P(w1)·P(w2)))` with the pair probability
    * over the corpus bigram total and unigram probabilities over the token
    * total. `minCount` cuts the rare-pair noise PMI is notorious for
    * (a pair seen once between two rare words maxes the score).
    *
    * Shape: two aggregations with map-side partial combines — one keyed by
    * token (unigram counts), one by (w1, w2) (pair counts) — both with
    * vocab-bounded outputs; the two scalar totals ride in as 1-row
    * broadcasts; the PMI arithmetic is a map-side projection over the
    * minCount-filtered pairs and the top-k is a TakeOrderedAndProject.
    * The unigram lookups stay plain equi-joins (vocab can outgrow a
    * broadcast at corpus scale — AQE promotes them when it fits). */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5, k: Int = 50): DataFrame = {
    val toks = docs.select(tokens(col("text")).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
    val uniCounts = uni.groupBy("w").agg(count(lit(1)).as("n_w"))
    val totalTokens = uni.agg(count(lit(1)).as("n_tokens"))
    val pairs = toks.filter(size(col("toks")) >= 2).select(explode(expr(
      "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"))
      .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val pairCounts = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val totalPairs = pairs.agg(count(lit(1)).as("n_bigrams"))
    pairCounts
      .filter(col("n_pair") >= minCount)
      .join(uniCounts.select(col("w").as("w1"), col("n_w").as("n_w1")), Seq("w1"))
      .join(uniCounts.select(col("w").as("w2"), col("n_w").as("n_w2")), Seq("w2"))
      .crossJoin(broadcast(totalTokens))
      .crossJoin(broadcast(totalPairs))
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log(col("n_pair").cast("double") * col("n_tokens") * col("n_tokens") /
          (col("n_bigrams").cast("double") * col("n_w1") * col("n_w2"))), 6).as("pmi"))
      .orderBy(desc("pmi"), col("w1"), col("w2"))
      .limit(k)
  }
}
