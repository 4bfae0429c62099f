package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY.md §2.10): the same
  * windowed aggregation expressions as [[graft.ops.Events]], executed by the
  * micro-batch engine with a watermark. For verification the parquet fixture
  * is replayed through the file source into a memory sink and drained
  * synchronously — the streaming result must equal the batch result.
  */
object EventStreams {

  /** `ts` arrives as raw nanos (long) — see [[graft.Tables.events]]. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val runId = new AtomicInteger(0)

  /** Replay the events parquet through a streaming tumbling-window count and
    * return the settled result. Complete output mode: every window is in the
    * final table (append mode would hold back windows newer than the
    * watermark). The watermark still bounds state at true-streaming scale. */
  def tumblingHourlyStream(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"graft_stream_${runId.incrementAndGet()}"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The fixture is a single parquet file; the file stream source requires
    // a directory, so stream the parent dir with a glob filter.
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n_events"), col("sum_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy("window_start")
  }
}
