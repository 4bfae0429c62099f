package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.11 X3/X4 +
  * build-target extensions): exact brute-force cosine top-k as the
  * correctness baseline, LSH-bucketed approximate search, IVF (inverted
  * file) partition-pruned search, and cosine near-duplicate pairs.
  *
  * Vector math is expressed with higher-order array functions
  * (`zip_with`/`aggregate`) over `array<double>` — Catalyst expressions,
  * no UDF serialization, and numerics identical to any sequential-fold
  * engine. Embeddings stay columnar `array<float>` at rest (X4) and are
  * widened to double only inside the expression.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a Column (arrays widened to double first). Higher-order
    * formulation — fine for one-off norms; the hot-path cosine below uses
    * the codegen'd expression instead. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ as a Column. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array columns — a native Catalyst expression
    * ([[graft.functions.CosineSimilarity]]): one fused loop, stays inside
    * whole-stage codegen (zip_with/aggregate are CodegenFallback and drop
    * every row out of the generated pipeline). Numerics identical: same
    * left-to-right double accumulation. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_similarity(a, b)

  /** Exact top-k by cosine against the embedding of `queryVecId`: the single
    * query row is broadcast, the scan streams once, and orderBy+limit plans
    * as TakeOrderedAndProject (per-partition top-k, merge of k·P rows — no
    * global sort). This is the O(N) baseline the ANN variants approximate.
    */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
      roundDigits: Int = 6): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("query_embedding"))
    graft.ops.Partitioning.spread(embeddings)
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(
        col("vec_id"),
        col("label"),
        // Rounded before ordering: similarity values are exact only to the
        // accumulation order of the dot product, so cross-engine comparisons
        // (and stable top-k boundaries) need a fixed precision + id tiebreak.
        round(cosine(col("embedding"), col("query_embedding")), roundDigits).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), col("vec_id"))
      .limit(k)
  }

  /** L2-normalized copy of the embedding column (unit vectors make euclidean
    * distance a monotone proxy for cosine: d² = 2 − 2·cos). The norm is
    * materialized once per row first — inlining it in the transform lambda
    * would re-run the d-element aggregate for every element (O(d²)/row). */
  private def normalized(embeddings: DataFrame): DataFrame =
    graft.ops.Partitioning.spread(embeddings)
      .withColumn("__nrm", l2norm(col("embedding")))
      .withColumn("norm_vec",
        array_to_vector(
          transform(col("embedding").cast("array<double>"), x => x / col("__nrm"))
            .cast("array<float>")))
      .drop("__nrm")

  /** Approximate NN via random-hyperplane bucketing
    * (BucketedRandomProjectionLSH over unit vectors): candidates come from
    * matching hash buckets only — sublinear probe cost at scale. */
  def lshTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
      bucketLength: Double = 0.5, numHashTables: Int = 4): DataFrame = {
    val normed = normalized(embeddings)
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("norm_vec").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42)
    val model = lsh.fit(normed)
    val queryVec = model.transform(normed).filter(col("vec_id") === queryVecId)
      .select("norm_vec").head().getAs[org.apache.spark.ml.linalg.Vector]("norm_vec")
    model
      .approxNearestNeighbors(normed.filter(col("vec_id") =!= queryVecId), queryVec, k, "dist")
      .select(
        col("vec_id"),
        col("label"),
        (lit(1.0) - col("dist") * col("dist") / 2).as("cosine_sim_approx"))
      .orderBy(desc("cosine_sim_approx"), col("vec_id"))
  }

  /** IVF (inverted-file) index: k-means coarse quantizer partitions the
    * corpus into `nlist` cells; a query probes only the `nprobe` nearest
    * cells and brute-forces within them — the classic FAISS-style recall/
    * cost dial. Centroids are tiny and broadcast; assignment is one pass.
    */
  final case class IvfIndex(assigned: DataFrame, centroids: Array[(Int, Array[Double])])

  def buildIvf(embeddings: DataFrame, nlist: Int = 16): IvfIndex = {
    val withVec = graft.ops.Partitioning.spread(embeddings)
      .withColumn("vec", array_to_vector(col("embedding").cast("array<double>")))
    val km = new KMeans().setK(nlist).setSeed(42).setFeaturesCol("vec").setPredictionCol("cell")
    val model = km.fit(withVec)
    val assigned = model.transform(withVec).drop("vec")
    val centroids = model.clusterCenters.zipWithIndex.map { case (v, i) => (i, v.toArray) }
    IvfIndex(assigned, centroids)
  }

  def ivfTopK(index: IvfIndex, queryVecId: Long, k: Int, nprobe: Int = 4): DataFrame = {
    val q = index.assigned.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    def cos(c: Array[Double]): Double = {
      val d = c.zip(q).map { case (x, y) => x * y }.sum
      val n1 = math.sqrt(c.map(x => x * x).sum); val n2 = math.sqrt(q.map(x => x * x).sum)
      if (n1 == 0 || n2 == 0) 0 else d / (n1 * n2)
    }
    val probeCells = index.centroids.sortBy { case (i, c) => (-cos(c), i) }.take(nprobe).map(_._1)
    val qLit = typedLit(q)
    index.assigned
      .filter(col("cell").isin(probeCells.toIndexedSeq: _*) && col("vec_id") =!= queryVecId)
      .select(
        col("vec_id"),
        col("label"),
        col("cell"),
        cosine(col("embedding"), qLit).as("cosine_sim"))
      .orderBy(desc("cosine_sim"), col("vec_id"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs via LSH similarity self-join:
    * pairs with cosine ≥ `minCosine`, candidates generated from shared LSH
    * buckets (equi-join), never a cross join.
    *
    * `bucketLength` is calibrated to unit vectors: projections of unit
    * d-vectors onto a random direction have std ≈ 1/√d (≈0.125 at d=64), so
    * 0.1 yields ~10 populated buckets per table — buckets genuinely
    * partition the corpus (0.5 would put nearly everything in 2-3 buckets
    * and degenerate the in-bucket join toward all-pairs). More hash tables
    * buy recall at linear candidate cost. */
  def cosineNearDupPairs(embeddings: DataFrame, minCosine: Double = 0.95,
      bucketLength: Double = 0.1, numHashTables: Int = 8): DataFrame = {
    val maxDist = math.sqrt(2.0 - 2.0 * minCosine)
    val normed = normalized(embeddings)
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("norm_vec").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42)
    val model = lsh.fit(normed)
    model.approxSimilarityJoin(normed, normed, maxDist, "dist")
      .select(
        col("datasetA.vec_id").as("vec_a"),
        col("datasetB.vec_id").as("vec_b"),
        (lit(1.0) - col("dist") * col("dist") / 2).as("cosine_sim"))
      .filter(col("vec_a") < col("vec_b"))
      .orderBy("vec_a", "vec_b")
  }
}
