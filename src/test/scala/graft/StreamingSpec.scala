package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.streaming.EventStreams

/** Streaming results must equal their batch formulations — the micro-batch
  * engine runs the same expressions (SURVEY.md §2.10). */
class StreamingSpec extends SparkSpec {

  private def batchTotals = Tables.events(spark, sf)
    .groupBy("user_id")
    .agg(
      count(lit(1)).as("n_events"),
      sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
    .orderBy("user_id")

  test("stateful per-user totals equal the batch GROUP BY") {
    val streamed = EventStreams.userTotalsStateful(spark, sf)
    assert(streamed.collect().toSeq == batchTotals.collect().toSeq)
  }

  test("stateful totals survive forced multi-batch replay (append-mode honesty)") {
    // Carve the fixture into 3 files and feed them one per micro-batch:
    // every user now gets multiple Append emissions; the settled read must
    // still equal the batch GROUP BY.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_multi").toString
    val ev = Tables.events(spark, sf)
    // Write three disjoint slices as separate single-file directories, then
    // move each part file up as events_<i>.parquet (glob: events*.parquet).
    (0 until 3).foreach { i =>
      val slice = ev.filter(pmod(col("event_id"), lit(3)) === i)
        // userTotalsStateful reads raw nanos (the fixture layout): undo the
        // Tables.events timestamp conversion for the re-written slices.
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
      val sliceDir = s"$dir/slice_$i"
      slice.coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events_$i.parquet"))
    }
    val streamed = EventStreams.userTotalsStateful(spark, dir, maxFilesPerTrigger = Some(1))
    assert(streamed.collect().toSeq == batchTotals.collect().toSeq)
  }

  test("streaming tumbling windows equal the batch tumbling windows") {
    val streamed = EventStreams.tumblingHourlyStream(spark, sf)
      .select("window_start", "n_events", "sum_value")
    val batch = graft.ops.Events.tumblingHourly(Tables.events(spark, sf))
      .select("window_start", "n_events", "sum_value")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }
}
