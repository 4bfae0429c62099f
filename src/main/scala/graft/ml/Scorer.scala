package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fs.{FeatureLookup, FeatureStore, TrainingSet}

/** Batch scoring with automated feature enrichment — the reference's
  * `score_batch` semantics (implied by fs.log_model packaging the training
  * set's lookups with the model, notebooks/02_model_training.py:478-484;
  * README.md:100 "Automated Feature Joins"): inference rows carrying only
  * keys are enriched by replaying the model's FeatureLookups, then scored.
  *
  * Persistence (reference M5, MLflow registry): `save` writes the
  * PipelineModel plus a sidecar JSON of its lookups so `load` can replay
  * enrichment in a fresh session — registry semantics without MLflow.
  */
final case class ScoringModel(model: PipelineModel, lookups: Seq[FeatureLookup]) {

  /** Enrich + score: fold of left lookup joins, then model.transform —
    * one distributed plan, no driver boundary (contrast the reference's
    * toPandas at 02_model_training.py:250). */
  def scoreBatch(store: FeatureStore, input: DataFrame): DataFrame = {
    val enriched = TrainingSet.fromStore(store, input, lookups).loadDf
    model.transform(enriched)
  }

  def save(path: String): Unit = {
    model.write.overwrite().save(s"$path/model")
    val json = lookups.map { lk =>
      s"""{"tableName":"${lk.tableName}","featureNames":[${lk.featureNames.map(f => s""""$f"""").mkString(",")}],
         |"lookupKey":"${lk.lookupKey}","tableKey":"${lk.tableKey}"}""".stripMargin.replace("\n", "")
    }.mkString("[", ",", "]")
    val p = new org.apache.hadoop.fs.Path(s"$path/lookups.json")
    val fs = p.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(json.getBytes("UTF-8")); out.close()
  }
}

object ScoringModel {

  def load(spark: SparkSession, path: String): ScoringModel = {
    val model = PipelineModel.load(s"$path/model")
    val p = new org.apache.hadoop.fs.Path(s"$path/lookups.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lookups = """\{"tableName":"(.*?)","featureNames":\[(.*?)\],"lookupKey":"(.*?)","tableKey":"(.*?)"\}""".r
      .findAllMatchIn(raw).map { m =>
        FeatureLookup(m.group(1),
          m.group(2).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq,
          m.group(3), Some(m.group(4)))
      }.toSeq
    ScoringModel(model, lookups)
  }
}
