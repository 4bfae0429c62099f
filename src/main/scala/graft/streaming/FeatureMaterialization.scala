package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fs.FeatureStore

/** Streaming feature materialization — the streaming half of the feature
  * store's write path (the reference's store is batch-written from
  * notebooks; a production feature platform continuously refreshes feature
  * tables from an event stream, which is exactly `writeStream.foreachBatch`
  * + PK upsert):
  *
  *  - the stream is aggregated with normal streaming state
  *    (`groupBy(user_id)` here — the engine holds one row of state per
  *    key);
  *  - Update output mode hands each micro-batch ONLY the keys whose
  *    aggregate changed, with their full recomputed values;
  *  - `foreachBatch` upserts those rows into the registered feature table
  *    by primary key.
  *
  * The settled table therefore equals the batch `GROUP BY` over the whole
  * history REGARDLESS of micro-batch carving (each key's last upsert
  * carries its complete aggregate — verified by StreamingSpec under forced
  * `maxFilesPerTrigger=1` replay), while per-batch write cost scales with
  * the keys touched in the batch, not the table size. On parquet the
  * upsert is a rewrite ([[graft.fs.FeatureStore.upsert]]); on Delta the
  * same loop is `MERGE INTO` and the cost drops to the touched files —
  * the standard streaming-materialization shape at 100 TB.
  */
object FeatureMaterialization {

  private val runId = new AtomicInteger(0)

  val TotalsTable = "user_totals_live"

  private val totalsSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("n_events", LongType),
    StructField("sum_value", DoubleType)))

  /** Continuously materialize per-user event totals into `store`.
    * Returns the settled feature table ordered by user. Exactness: the sum
    * is accumulated in DECIMAL(18,2) streaming state (no float drift
    * across batches), cast to double only on output. */
  def userTotalsMaterialized(spark: SparkSession, sfDir: String,
      store: FeatureStore, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val ss = EventStreams.streamSession(spark)
    // Register the target table up front (empty, schema-only) so the
    // stream upserts into a declared PK contract rather than inventing one.
    store.createTable(TotalsTable, Seq("user_id"),
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], totalsSchema),
      "per-user event totals, continuously refreshed from the event stream")

    val totals = EventStreams.eventsStream(ss, sfDir, maxFilesPerTrigger)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))

    // Wiped per call: a stopped stream's checkpoint is dead state, and the
    // runId keeps invocations within one JVM from colliding while the
    // WorkDirs root bounds what any run can leave behind.
    val chk = graft.WorkDirs.fresh(s"mat_chk_${runId.incrementAndGet()}")
    val q = totals.writeStream
      .outputMode("update")
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) store.upsert(TotalsTable, batch.toDF())
        () // upsert returns the FeatureTable; foreachBatch wants Unit
      }
      .start()
    try q.processAllAvailable() finally {
      q.stop()
      // A stopped stream's checkpoint is dead state — remove it now rather
      // than waiting for the JVM-exit sweep of the WorkDirs root.
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(chk))
      catch { case _: java.io.IOException => () }
    }
    store.readTable(TotalsTable).orderBy("user_id")
  }
}
