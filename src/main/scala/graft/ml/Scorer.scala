package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s.{DefaultFormats, Extraction, Formats, JArray, JNothing, JObject, JValue}
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import graft.fs.{FeatureLookup, FeatureResolver, LookupHint, TrainingSet}
import graft.ml.Metrics.ClassificationMetrics
import graft.ml.Trainer.TrainParams

/** Batch scoring with automated feature enrichment — the reference's
  * `score_batch` semantics (implied by fs.log_model packaging the training
  * set's lookups with the model, notebooks/02_model_training.py:478-484;
  * README.md:100 "Automated Feature Joins"): inference rows carrying only
  * keys are enriched by replaying the model's FeatureLookups, then scored.
  *
  * Persistence (reference M5, MLflow registry): `save` writes the
  * PipelineModel plus a sidecar JSON of its lookups AND a metrics/params
  * sidecar (the reference logs metrics, params and artifacts next to the
  * registered model, notebooks/02_model_training.py:446-467), so a user
  * reloading a model sees what it scored at train time — registry semantics
  * without MLflow.
  */
final case class ScoringModel(
    model: PipelineModel,
    lookups: Seq[FeatureLookup],
    metrics: Option[ClassificationMetrics] = None,
    params: Option[TrainParams] = None) {

  /** Enrich + score: fold of left lookup joins, then model.transform —
    * one distributed plan, no driver boundary (contrast the reference's
    * toPandas at 02_model_training.py:250). */
  def scoreBatch(store: FeatureResolver, input: DataFrame): DataFrame = {
    val enriched = TrainingSet.fromStore(store, input, lookups).loadDf
    model.transform(enriched)
  }

  /** Lossless lookup persistence (hint and renames included) with a real
    * JSON writer — names containing quotes/commas survive the round-trip.
    * Train-time metrics and params ride in `metrics.json` when present. */
  def save(path: String): Unit = {
    import ScoringModel.jsonFormats
    model.write.overwrite().save(s"$path/model")
    val lookupsJson: JValue = JArray(lookups.map { lk =>
      ("tableName" -> lk.tableName) ~
        ("featureNames" -> lk.featureNames) ~
        ("lookupKey" -> lk.lookupKey) ~
        ("tableKey" -> lk.tableKey) ~
        ("hint" -> ScoringModel.hintName(lk.hint)) ~
        ("renames" -> lk.renames) ~
        ("timestampLookupKey" -> lk.timestampLookupKey) ~
        ("tableTimestampKey" -> lk.tableTimestampKey)
    }.toList)
    ScoringModel.writeText(s"$path/lookups.json",
      JsonMethods.compact(JsonMethods.render(lookupsJson)))
    if (metrics.nonEmpty || params.nonEmpty) {
      val sidecar: JValue =
        ("metrics" -> metrics.map(Extraction.decompose).getOrElse(JNothing: JValue)) ~
          ("params" -> params.map(Extraction.decompose).getOrElse(JNothing: JValue))
      ScoringModel.writeText(s"$path/metrics.json",
        JsonMethods.compact(JsonMethods.render(sidecar)))
    }
  }
}

object ScoringModel {

  private[ml] implicit val jsonFormats: Formats = DefaultFormats

  private[ml] def hintName(h: LookupHint): String = h match {
    case LookupHint.Broadcast => "broadcast"
    case LookupHint.Auto      => "auto"
  }

  private def hintOf(name: String): LookupHint = name match {
    case "broadcast" => LookupHint.Broadcast
    case _           => LookupHint.Auto
  }

  private def writeText(pathStr: String, text: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(pathStr)
    val fs = p.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(text.getBytes("UTF-8"))
    out.close()
  }

  private def readText(spark: SparkSession, pathStr: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(pathStr)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      Some(try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close())
    }
  }

  /** Load a persisted model. Forward-compatible with sidecars written by
    * earlier releases: `hint`/`renames`/`tableKey` fall back to their
    * defaults when absent (older lookups.json stays loadable), and a missing
    * metrics.json just yields metrics = params = None. */
  def load(spark: SparkSession, path: String): ScoringModel = {
    val model = PipelineModel.load(s"$path/model")
    val raw = readText(spark, s"$path/lookups.json")
      .getOrElse(sys.error(s"$path/lookups.json not found"))
    val lookups = JsonMethods.parse(raw) match {
      case JArray(items) => items.collect { case o: JObject =>
        FeatureLookup(
          (o \ "tableName").extract[String],
          (o \ "featureNames").extract[Seq[String]],
          (o \ "lookupKey").extract[String],
          (o \ "tableKey").extractOpt[String],
          (o \ "hint").extractOpt[String].map(hintOf).getOrElse(LookupHint.Auto),
          (o \ "renames").extractOpt[Map[String, String]].getOrElse(Map.empty),
          (o \ "timestampLookupKey").extractOpt[String],
          (o \ "tableTimestampKey").extractOpt[String])
      }
      case other => sys.error(s"lookups.json: expected a JSON array, got $other")
    }
    val (metrics, params) = readText(spark, s"$path/metrics.json") match {
      case None => (None, None)
      case Some(text) =>
        val j = JsonMethods.parse(text)
        ((j \ "metrics").extractOpt[ClassificationMetrics],
          (j \ "params").extractOpt[TrainParams])
    }
    ScoringModel(model, lookups, metrics, params)
  }
}
