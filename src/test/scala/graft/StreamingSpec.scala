package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.streaming.EventStreams

/** Streaming results must equal their batch formulations — the micro-batch
  * engine runs the same expressions (SURVEY.md §2.10). */
class StreamingSpec extends SparkSpec {

  test("stateful per-user totals equal the batch GROUP BY") {
    val streamed = EventStreams.userTotalsStateful(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .orderBy("user_id")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("streaming tumbling windows equal the batch tumbling windows") {
    val streamed = EventStreams.tumblingHourlyStream(spark, sf)
      .select("window_start", "n_events", "sum_value")
    val batch = graft.ops.Events.tumblingHourly(Tables.events(spark, sf))
      .select("window_start", "n_events", "sum_value")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }
}
