package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.EventStreams
import graft.ops.Events

class PipelineOpsSpec extends SparkSpec {

  test("multimodal feature extraction: fixed dim, deterministic, batched") {
    val docs = Tables.documents(spark, sf)
    val feats = Multimodal.extractFeatures(spark, Multimodal.mediaFromDocuments(docs), dim = 16)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach(r => assert(r.feature.length == 16))
    val again = Multimodal.extractFeatures(spark, Multimodal.mediaFromDocuments(docs), dim = 16)
      .collect()
    assert(rows.sortBy(_.media_id).map(_.feature.toSeq).toSeq ==
      again.sortBy(_.media_id).map(_.feature.toSeq).toSeq)
  }

  test("streaming tumbling aggregation equals the batch result") {
    val streamed = EventStreams.tumblingHourlyStream(spark, sf)
      .select("window_start", "n_events", "sum_value").collect()
    val batch = Events.tumblingHourly(Tables.events(spark, sf))
      .select("window_start", "n_events", "sum_value").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("event sessions: counts sum to total events") {
    val events = Tables.events(spark, sf)
    val sessions = Events.userSessions(events)
    assert(sessions.agg(sum("n_events")).head().getLong(0) == events.count())
  }

  test("sliding windows hold each event exactly twice") {
    val events = Tables.events(spark, sf)
    val sliding = Events.slidingHourly(events)
    assert(sliding.agg(sum("n_events")).head().getLong(0) == 2 * events.count())
  }
}
