package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (build-target extension): image/audio/video
  * payloads are opaque `binary` columns travelling next to typed metadata;
  * decode / feature-extraction runs partition-batched so one task touches
  * many payloads without per-row overhead.
  *
  * The decode kernel itself is a STUB — this container has no image/audio
  * codecs — implemented as a deterministic fake so the Spark-side plumbing
  * (schema, batching, partitioning, feature shape) is real and testable.
  * Swapping in a real decoder changes only [[fakeDecode]].
  */
object Multimodal {

  /** A media row: payload + typed metadata. */
  final case class MediaRow(media_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Extracted features per media row (fixed-width embedding). */
  final case class MediaFeatures(media_id: Long, n_bytes: Long, feature: Array[Float])

  /** Manufacture a media table from the documents fixture: the text bytes
    * stand in for an encoded image payload. In production this column comes
    * straight from parquet `binary`. */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("mime"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decode: a real implementation would decode the payload
    * (image/audio frame) and run a feature extractor. The fake derives a
    * deterministic `dim`-float signature from payload bytes so tests can
    * assert shape + determinism. */
  private[multimodal] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Partition-batched feature extraction: mapPartitions keeps the (real)
    * decoder's per-batch setup cost amortized across all rows of a task —
    * the Scala analog of pandas-batched UDFs. Output is a typed Dataset so
    * downstream gets a static schema. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"), col("n_bytes"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { rows =>
        // Real decoder: initialize codec/session once per partition here.
        rows.map { case (id, payload, nBytes) =>
          MediaFeatures(id, nBytes, fakeDecode(payload, dim))
        }
      }
  }

  /** End-to-end: media table → features → per-mime stats (exercises the
    * typed path back into relational aggregation). */
  def mediaFeatureStats(spark: SparkSession, documents: DataFrame, dim: Int = 16): DataFrame = {
    val feats = extractFeatures(spark, mediaFromDocuments(documents), dim).toDF()
    feats.select(
      col("media_id"),
      col("n_bytes"),
      round(element_at(col("feature"), 1).cast("double"), 4).as("f0"),
      size(col("feature")).as("feature_dim"))
      .orderBy("media_id")
  }
}
