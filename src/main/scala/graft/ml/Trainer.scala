package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StringType

/** Gradient-boosted-tree training over a training-set DataFrame — the
  * distributed replacement for the reference's driver-local CatBoost fit
  * (notebooks/02_model_training.py:87-97, :422-436: 100 iterations,
  * lr 0.1, depth 6, seed 42). Early stopping (od_wait/use_best_model) has no
  * Spark ML equivalent — iterations are fixed (SURVEY.md §7.5 risk 3).
  *
  * Categorical handling mirrors the reference's M1 (02_model_training.py:
  * 311-328): string-typed columns are discovered from the schema and
  * index-encoded (tree models consume the ordinal index directly, as
  * CatBoost consumes categorical feature indices).
  */
object Trainer {

  final case class TrainParams(
      maxIter: Int = 100,
      stepSize: Double = 0.1,
      maxDepth: Int = 6,
      seed: Long = 42L)

  /** String-typed feature columns (schema-driven, no data pass). */
  def categoricalColumns(df: DataFrame, labelColumn: String): Seq[String] =
    df.schema.fields
      .filter(f => f.dataType == StringType && f.name != labelColumn)
      .map(_.name).toSeq

  /** Assemble the pipeline: index categoricals → vector-assemble → GBT. */
  def pipeline(df: DataFrame, labelColumn: String, params: TrainParams = TrainParams()): Pipeline = {
    val cats = categoricalColumns(df, labelColumn)
    val indexers = cats.map { c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}__idx")
        .setHandleInvalid("keep").setStringOrderType("alphabetAsc")
    }
    val numeric = df.columns.filterNot(c => c == labelColumn || cats.contains(c))
    val features = numeric ++ cats.map(c => s"${c}__idx")
    val assembler = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .setHandleInvalid("keep") // nulls → NaN; trees route them (CatBoost parity)
    val gbt = new GBTClassifier()
      .setLabelCol(labelColumn).setFeaturesCol("features")
      .setMaxIter(params.maxIter).setStepSize(params.stepSize)
      .setMaxDepth(params.maxDepth).setSeed(params.seed)
      .setProbabilityCol("probability").setPredictionCol("prediction")
    new Pipeline().setStages((indexers :+ assembler :+ gbt).toArray)
  }

  def fit(train: DataFrame, labelColumn: String, params: TrainParams = TrainParams()): PipelineModel =
    pipeline(train, labelColumn, params).fit(train)

  /** Label histogram (reference A2: 02_model_training.py:260-261 —
    * `value_counts` driving the stratification decision). One hash agg. */
  def labelHistogram(df: DataFrame, labelColumn: String): DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(col(labelColumn)).agg(count(lit(1)).as("n")).orderBy(col(labelColumn))
  }

  /** Stratified 80/20 split (reference SP1: 02_model_training.py:264-267,
    * stratify=y, seed 42), assigned by a salted content hash:
    * `xxhash64(key columns, seed) mod 10000 < 8000`.
    *
    * Deterministic and partition-independent — the same data produces the
    * same split on any cluster layout (contrast `sampleBy`/`randomSplit`,
    * whose Bernoulli draw depends on partition iteration order). Fully
    * parallel: one narrow pass, no window, no shuffle — a 100 TB frame
    * splits at scan speed. Within each class the hash is uniform, so class
    * proportions match `trainFraction` with binomial O(1/√n_class) error —
    * exact enough at any real scale; sklearn's exact permutation parity is
    * not reproducible and not the contract (SURVEY.md §7.5 risk 1).
    *
    * `keyColumns` picks what gets hashed — the split's unit of assignment:
    *  - Pass a unique row id (recommended) for an i.i.d. row-level split.
    *  - Pass an entity key (e.g. user_id) to keep all of an entity's rows on
    *    one side — the standard leakage guard for grouped data.
    *  - Default (empty) hashes ALL hashable columns: rows that are exact
    *    duplicates then co-travel, so heavily duplicated data skews the
    *    achieved fraction away from `trainFraction` (every copy of a
    *    dominant row lands on one side). That co-travel is sometimes wanted
    *    (duplicate leakage guard) but surprises otherwise — supply
    *    `keyColumns` when the frame has no unique key and duplicates exist.
    *    Map-typed columns are excluded (xxhash64 cannot hash maps).
    *
    * Stratification is STATISTICAL, not enforced: the label never enters
    * the assignment — per-class proportions follow from hash uniformity
    * within each class (binomial error above). That guarantee weakens when
    * the hash unit correlates with the label (e.g. `keyColumns` = an
    * entity key whose entities share labels): group-integrity and exact
    * stratification are fundamentally at odds, and this splitter always
    * chooses group integrity. `labelColumn` is validated and documented
    * here so callers know which contract they are getting.
    */
  def stratifiedSplit(df: DataFrame, labelColumn: String, trainFraction: Double = 0.8,
      seed: Long = 42L, keyColumns: Seq[String] = Nil): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.MapType
    require(df.columns.contains(labelColumn),
      s"stratifiedSplit: label column $labelColumn not in frame")
    val hashCols =
      if (keyColumns.nonEmpty) {
        val missing = keyColumns.filterNot(df.columns.contains)
        require(missing.isEmpty, s"stratifiedSplit: key columns not in frame: ${missing.mkString(", ")}")
        keyColumns
      } else {
        val hashable = df.schema.fields
          .filterNot(_.dataType.isInstanceOf[MapType]).map(_.name).toSeq
        require(hashable.nonEmpty, "stratifiedSplit: no hashable (non-map) columns to key the split on")
        hashable
      }
    val bucket = pmod(xxhash64((hashCols.map(col) :+ lit(seed)): _*), lit(10000L))
    val isTrain = bucket < lit(math.round(trainFraction * 10000))
    (df.filter(isTrain), df.filter(!isTrain))
  }

  /** Feature importances zipped with feature names (reference M4:
    * 02_model_training.py:462-465). */
  def featureImportances(model: PipelineModel): Seq[(String, Double)] = {
    val gbt = model.stages.last.asInstanceOf[org.apache.spark.ml.classification.GBTClassificationModel]
    val assembler = model.stages.collectFirst { case v: VectorAssembler => v }.get
    assembler.getInputCols.toSeq.zip(gbt.featureImportances.toArray.toSeq)
      .sortBy { case (_, imp) => -imp }
  }
}
