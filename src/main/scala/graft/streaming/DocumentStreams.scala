package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming document dedup (the streaming face of SURVEY.md §2.11 X1):
  * exact dedup expressed over an unbounded source with
  * `dropDuplicates` keyed by content hash — each distinct document content
  * is emitted exactly once across ALL micro-batches, which is how a
  * continuously-ingesting curation pipeline keeps its corpus unique.
  */
object DocumentStreams {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val runId = new AtomicInteger(0)

  /** Replay the documents parquet through a streaming hash-dedup and return
    * the settled distinct content-hash set (deterministic regardless of
    * batch carving: the SET of distinct hashes is order-independent, which
    * is why the query emits hashes rather than an arbitrary surviving
    * doc_id per group).
    *
    * State scale: one row per distinct hash, partitioned by hash across
    * executors. With an event-time column this would be
    * `withWatermark(...).dropDuplicatesWithinWatermark(...)` so state ages
    * out; the documents fixture has no timestamps, so state here is
    * bounded by corpus cardinality instead (documented trade-off). */
  def streamingDistinctHashes(spark: SparkSession, sfDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val name = s"graft_stream_docs_${runId.incrementAndGet()}"
    val ss = EventStreams.streamSession(spark)
    val reader = ss.readStream
      .schema(documentsSchema)
      .option("pathGlobFilter", "documents*.parquet")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val distinctHashes = reader
      .parquet(sfDir)
      .select(sha2(col("text"), 256).as("content_hash"))
      .dropDuplicates("content_hash")
    val q = distinctHashes.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    EventStreams.settle(spark, name, ss.table(name).orderBy("content_hash"))
  }
}
