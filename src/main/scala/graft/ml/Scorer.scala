package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s.{DefaultFormats, Formats, JArray, JObject, JValue}
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import graft.fs.{FeatureLookup, FeatureResolver, LookupHint, TrainingSet}

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
  def scoreBatch(store: FeatureResolver, input: DataFrame): DataFrame = {
    val enriched = TrainingSet.fromStore(store, input, lookups).loadDf
    model.transform(enriched)
  }

  /** Lossless lookup persistence (hint and renames included) with a real
    * JSON writer — names containing quotes/commas survive the round-trip. */
  def save(path: String): Unit = {
    model.write.overwrite().save(s"$path/model")
    val json: JValue = JArray(lookups.map { lk =>
      ("tableName" -> lk.tableName) ~
        ("featureNames" -> lk.featureNames) ~
        ("lookupKey" -> lk.lookupKey) ~
        ("tableKey" -> lk.tableKey) ~
        ("hint" -> ScoringModel.hintName(lk.hint)) ~
        ("renames" -> lk.renames)
    }.toList)
    val p = new org.apache.hadoop.fs.Path(s"$path/lookups.json")
    val fs = p.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(JsonMethods.compact(JsonMethods.render(json)).getBytes("UTF-8"))
    out.close()
  }
}

object ScoringModel {

  private implicit val formats: Formats = DefaultFormats

  private[ml] def hintName(h: LookupHint): String = h match {
    case LookupHint.Broadcast => "broadcast"
    case LookupHint.Auto      => "auto"
  }

  private def hintOf(name: String): LookupHint = name match {
    case "broadcast" => LookupHint.Broadcast
    case _           => LookupHint.Auto
  }

  def load(spark: SparkSession, path: String): ScoringModel = {
    val model = PipelineModel.load(s"$path/model")
    val p = new org.apache.hadoop.fs.Path(s"$path/lookups.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lookups = JsonMethods.parse(raw) match {
      case JArray(items) => items.collect { case o: JObject =>
        FeatureLookup(
          (o \ "tableName").extract[String],
          (o \ "featureNames").extract[Seq[String]],
          (o \ "lookupKey").extract[String],
          Some((o \ "tableKey").extract[String]),
          hintOf((o \ "hint").extract[String]),
          (o \ "renames").extract[Map[String, String]])
      }
      case other => sys.error(s"lookups.json: expected a JSON array, got $other")
    }
    ScoringModel(model, lookups)
  }
}
