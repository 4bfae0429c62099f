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
    val dir = tempDir("graft_stream_multi")
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

  test("streaming materialization upserts into the feature store, multi-batch, == batch GROUP BY") {
    import graft.fs.FeatureStore
    import graft.streaming.FeatureMaterialization
    // Same 3-file carve as above: every micro-batch triggers a foreachBatch
    // upsert, so the table is rewritten per batch — the settled read must
    // still equal the batch GROUP BY (each key's last upsert carries its
    // full aggregate).
    val dir = tempDir("graft_stream_mat")
    val ev = Tables.events(spark, sf)
    (0 until 3).foreach { i =>
      val slice = ev.filter(pmod(col("event_id"), lit(3)) === i)
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
      val sliceDir = s"$dir/slice_$i"
      slice.coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events_$i.parquet"))
    }
    val storeDir = tempDir("graft_mat_store")
    val store = new FeatureStore(spark, storeDir)
    val settled = FeatureMaterialization.userTotalsMaterialized(
      spark, dir, store, maxFilesPerTrigger = Some(1))
    assert(settled.collect().toSeq == batchTotals.collect().toSeq)
    // The table is durably in the store (re-read through the registry),
    // keyed by user_id.
    val table = store.readTable(FeatureMaterialization.TotalsTable)
    assert(table.count() == batchTotals.count())
    assert(store.getTable(FeatureMaterialization.TotalsTable).primaryKeys == Seq("user_id"))
  }

  test("streaming dedup emits each distinct content hash once, even multi-batch") {
    val docs = Tables.documents(spark, sf)
    val batchHashes = docs.select(sha2(col("text"), 256).as("content_hash"))
      .distinct().orderBy("content_hash").collect().map(_.getString(0)).toSeq

    val single = graft.streaming.DocumentStreams.streamingDistinctHashes(spark, sf)
      .collect().map(_.getString(0)).toSeq
    assert(single == batchHashes)

    // Forced multi-batch: carve the fixture into 3 files, one per trigger —
    // dedup state must hold across batches (no hash re-emitted).
    val dir = tempDir("graft_docs_multi")
    (0 until 3).foreach { i =>
      val sliceDir = s"$dir/slice_$i"
      docs.filter(pmod(col("doc_id"), lit(3)) === i).coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/documents_$i.parquet"))
    }
    val multi = graft.streaming.DocumentStreams
      .streamingDistinctHashes(spark, dir, maxFilesPerTrigger = Some(1))
      .collect().map(_.getString(0)).toSeq
    assert(multi == batchHashes)
  }

  test("transformWithState totals equal the batch GROUP BY, single and multi-batch") {
    // The Spark 4 StatefulProcessor path must agree with the batch answer
    // AND with the flatMapGroupsWithState form it modernizes.
    val single = EventStreams.userTotalsTransformWithState(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(single == batchTotals.collect().map(_.toSeq).toSeq)
    assert(single == EventStreams.userTotalsStateful(spark, sf)
      .collect().map(_.toSeq).toSeq)

    // Forced multi-batch: RocksDB value state must survive across
    // micro-batches (3 files, one per trigger, append emissions per batch).
    val dir = tempDir("graft_tws_multi")
    val ev = Tables.events(spark, sf)
    (0 until 3).foreach { i =>
      val slice = ev.filter(pmod(col("event_id"), lit(3)) === i)
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
      val sliceDir = s"$dir/slice_$i"
      slice.coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events_$i.parquet"))
    }
    val multi = EventStreams.userTotalsTransformWithState(spark, dir,
      maxFilesPerTrigger = Some(1)).collect().map(_.toSeq).toSeq
    assert(multi == batchTotals.collect().map(_.toSeq).toSeq)
  }

  test("streaming funnel settles to the batch funnel, even with out-of-order multi-batch arrival") {
    val batch = graft.ops.Events.funnel(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSeq

    val single = EventStreams.funnelStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(single == batch)

    // Forced multi-batch, carved by id (NOT by time): each batch delivers
    // an arbitrary interleaving, so later batches contain EARLIER views —
    // exactly the late-arrival case whose re-qualification the pruned
    // state must still answer correctly.
    val dir = tempDir("graft_funnel_multi")
    val ev = Tables.events(spark, sf)
    (0 until 3).foreach { i =>
      val slice = ev.filter(pmod(col("event_id"), lit(3)) === i)
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
      val sliceDir = s"$dir/slice_$i"
      slice.coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events_$i.parquet"))
    }
    val multi = EventStreams.funnelStream(spark, dir,
      maxFilesPerTrigger = Some(1)).collect().map(_.toSeq).toSeq
    assert(multi == batch)
  }

  test("watermark dedup keeps exactly the distinct key set, even multi-batch") {
    val batchKeys = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .distinct().orderBy("user_id", "event_type", "hour")
      .collect().map(_.toSeq).toSeq

    val single = EventStreams.watermarkDedupStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(single == batchKeys)

    // Forced multi-batch — carved into CONTIGUOUS TIME slices, not by id:
    // a watermarked stateful operator DROPS late rows, so replaying an
    // out-of-time-order carving would silently lose keys (that's the
    // semantics, not a bug). Time-ordered slices keep every row on-time
    // while still forcing dedup state to persist across micro-batches for
    // keys whose hour straddles a slice boundary.
    val dir = tempDir("graft_wm_multi")
    val ev = Tables.events(spark, sf)
    val sliced = ev.withColumn("__slice",
      org.apache.spark.sql.functions.ntile(3).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    (1 to 3).foreach { i =>
      val slice = sliced.filter(col("__slice") === i).drop("__slice")
        .withColumn("ts", expr("unix_micros(ts) * 1000")) // back to raw nanos
      val sliceDir = s"$dir/slice_$i"
      slice.coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events_$i.parquet"))
    }
    val multi = EventStreams.watermarkDedupStream(spark, dir, maxFilesPerTrigger = Some(1))
      .collect().map(_.toSeq).toSeq
    assert(multi == batchKeys)
  }

  test("streaming tumbling windows equal the batch tumbling windows") {
    val streamed = EventStreams.tumblingHourlyStream(spark, sf)
      .select("window_start", "n_events", "sum_value")
    val batch = graft.ops.Events.tumblingHourly(Tables.events(spark, sf))
      .select("window_start", "n_events", "sum_value")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("streaming sliding windows equal the batch sliding windows") {
    val streamed = EventStreams.slidingHourlyStream(spark, sf)
      .select("window_start", "n_events")
    val batch = graft.ops.Events.slidingHourly(Tables.events(spark, sf))
      .select("window_start", "n_events")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("append-mode watermark drops late data and finalizes windows exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(hour: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")
    val source = MemoryStream[(java.sql.Timestamp, Long)]
    val windows = source.toDF().toDF("ts", "v")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))
    val q = windows.writeStream.outputMode("append")
      .format("memory").queryName("graft_late_test").start()
    try {
      // Batch 1: on-time events at hours 1, 2, 3 -> watermark advances to
      // 02:00; only window [01:00) is final (end <= watermark).
      source.addData((ts(1), 1L), (ts(2), 2L), (ts(3), 3L))
      q.processAllAvailable()
      // Batch 2: an event at hour 0 is >1h late -> its window is already
      // expired and the row must be DROPPED, not resurrected.
      source.addData((ts(0), 99L))
      q.processAllAvailable()
      // Batch 3: far-future sentinel pushes the watermark past everything
      // on time, flushing the held windows.
      source.addData((ts(10), 4L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("graft_late_test")
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    spark.catalog.dropTempView("graft_late_test")
    assert(!got.contains(ts(0)), s"late row leaked into an expired window: $got")
    assert(got(ts(1)) == 1L && got(ts(2)) == 1L && got(ts(3)) == 1L, s"windows wrong: $got")
  }

  test("stream-static enrichment equals the batch join, single and multi-batch") {
    val batch = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf).select(
        col("c_custkey").as("user_id"), col("c_mktsegment")), Seq("user_id"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .orderBy("c_mktsegment")
      .collect().toSeq
    assert(batch.nonEmpty)

    val single = EventStreams.segmentTotalsStream(spark, sf).collect().toSeq
    assert(single == batch)

    // Multi-batch: the per-batch joins must accumulate to the same totals.
    val dir = tempDir("graft_enrich_multi")
    val ev = Tables.events(spark, sf)
    (0 until 3).foreach { i =>
      val slice = ev.filter(pmod(col("event_id"), lit(3)) === i)
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
      val sliceDir = s"$dir/slice_$i"
      slice.coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events_$i.parquet"))
    }
    // The static dimension lives beside the stream files.
    Tables.customer(spark, sf).write.parquet(s"$dir/customer.parquet")
    val multi = EventStreams.segmentTotalsStream(spark, dir, maxFilesPerTrigger = Some(1))
      .collect().toSeq
    assert(multi == batch)
  }

  test("streaming sessionization equals the batch session windows, even multi-batch") {
    val batch = graft.ops.Events.userSessions(Tables.events(spark, sf))
      .collect().toSeq
    assert(batch.nonEmpty)
    val single = EventStreams.userSessionsStream(spark, sf).collect().toSeq
    assert(single == batch)
  }

  test("stream-stream interval join equals the batch interval join") {
    val ev = Tables.events(spark, sf)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    val batch = views.join(purchases,
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("micros_to_purchase"))
      .orderBy("view_id", "purchase_id")
      .collect().toSeq
    assert(batch.nonEmpty)

    val streamed = EventStreams.attributionJoinStream(spark, sf).collect().toSeq
    assert(streamed == batch)
    // Every pair's lag sits inside the attribution window.
    streamed.foreach { r =>
      val lag = r.getAs[Long]("micros_to_purchase")
      assert(lag >= 0 && lag <= 3600L * 1000000)
    }

    // Multi-batch: TIME-ORDERED slices (the ordering the operator's
    // equality claim is conditioned on — each batch's earliest event must
    // not trail the previous batch's watermark). Cross-batch pairs (view
    // in slice i, purchase in slice i+1) must still be found from buffered
    // join state.
    val dir = tempDir("graft_join_multi")
    val tiles = ev.select(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val (lo, hi) = (tiles.getTimestamp(0).getTime, tiles.getTimestamp(1).getTime)
    val cut = (hi - lo) / 3
    (0 until 3).foreach { i =>
      val from = lo + i * cut
      val until = if (i == 2) hi + 1 else lo + (i + 1) * cut
      val slice = ev
        .filter(col("ts") >= lit(new java.sql.Timestamp(from)) &&
          col("ts") < lit(new java.sql.Timestamp(until)))
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
      val sliceDir = s"$dir/slice_$i"
      slice.coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events_$i.parquet"))
    }
    val multi = EventStreams.attributionJoinStream(spark, dir, maxFilesPerTrigger = Some(1))
      .collect().toSeq
    assert(multi == batch)
  }

  test("settle refuses an oversized stream result instead of collecting it") {
    // The driver-side materialization in settle is only safe because every
    // settled output is a bounded aggregate; the cap turns a future
    // violation into this message instead of a driver OOM. The fetch is
    // limit(max+1), so the oversized case never pulls the full result.
    val big = spark.range(0, 100).toDF("id")
    big.createOrReplaceTempView("graft_settle_cap_probe")
    val e = intercept[IllegalArgumentException] {
      EventStreams.settle(spark, "graft_settle_cap_probe", big, maxRows = 10)
    }
    assert(e.getMessage.contains("graft_settle_cap_probe"))
    assert(e.getMessage.contains("bounded aggregate"))
    // Under the cap, settle returns the rows and drops the sink view.
    val small = spark.range(0, 5).toDF("id")
    small.createOrReplaceTempView("graft_settle_cap_probe")
    val out = EventStreams.settle(spark, "graft_settle_cap_probe", small, maxRows = 10)
    assert(out.count() == 5)
    assert(!spark.catalog.tableExists("graft_settle_cap_probe"))
  }

  test("streaming transitions settle to the batch matrix, multi-batch, bounded state") {
    val batch = graft.ops.Events.eventTransitions(Tables.events(spark, sf))
      .collect().map(_.toSeq).toSeq

    val single = EventStreams.transitionsStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(single == batch)

    // Forced multi-batch, carved into contiguous TIME slices (the
    // watermark-style contract: lateness bounded by the horizon). State
    // must carry cross-boundary pairs AND finalized counts across
    // triggers; tight 2h horizon exercises real pruning on a fixture
    // spanning weeks.
    val dir = tempDir("graft_trans_multi")
    val ev = Tables.events(spark, sf)
    val sliced = ev.withColumn("__slice",
      org.apache.spark.sql.functions.ntile(3).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    (1 to 3).foreach { i =>
      val slice = sliced.filter(col("__slice") === i).drop("__slice")
        .withColumn("ts", expr("unix_micros(ts) * 1000"))
      val sliceDir = s"$dir/slice_$i"
      slice.coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/events_$i.parquet"))
    }
    val multi = EventStreams.transitionsStream(spark, dir,
      maxFilesPerTrigger = Some(1)).collect().map(_.toSeq).toSeq
    assert(multi == batch)

    // Degenerate unbounded-horizon mode must agree too (the arbitrary-
    // disorder fallback).
    val unbounded = EventStreams.transitionsStream(spark, dir,
      maxFilesPerTrigger = Some(1), horizonHours = Int.MaxValue)
      .collect().map(_.toSeq).toSeq
    assert(unbounded == batch)
  }

  test("streaming SCD2 maintenance settles to the full rebuild, multi-batch") {
    val orders = Tables.orders(spark, sf)
    val full = graft.ops.Relational.scd2Build(orders).collect().map(_.toSeq).toSeq

    val single = EventStreams.scd2MaintainStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(single == full)

    // Time-carved slices (the append-only-per-key arrival contract):
    // ntile over (o_orderdate, o_orderkey) keeps same-date rows ordered by
    // orderkey across the boundary, which is exactly the order the full
    // rebuild's tiebreak uses — history folds must continue versions, close
    // open intervals, and pass untouched keys through, batch after batch.
    val dir = tempDir("graft_scd2_multi")
    val sliced = orders.withColumn("__slice",
      org.apache.spark.sql.functions.ntile(3).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("o_orderdate"), col("o_orderkey"))))
    (1 to 3).foreach { i =>
      val slice = sliced.filter(col("__slice") === i).drop("__slice")
      val sliceDir = s"$dir/slice_$i"
      slice.coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/orders_$i.parquet"))
    }
    val multi = EventStreams.scd2MaintainStream(spark, dir,
      maxFilesPerTrigger = Some(1)).collect().map(_.toSeq).toSeq
    assert(multi == full)
  }

  test("streaming SCD2 enrichment settles to the batch point-in-time lookup") {
    val orders = Tables.orders(spark, sf)
    val events = Tables.events(spark, sf)
    val batch = graft.ops.Relational.scd2PointInTime(events, orders)
      .collect().map(_.toSeq).toSeq

    // Single batch: the whole dimension arrives at once, every key is
    // touched once, settled == batch trivially but exercises the wiring.
    val single = EventStreams.scd2EnrichStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(single == batch)

    // Multi-batch under the time-carved arrival contract: keys touched by
    // several batches are re-enriched each time, and ONLY the last
    // emission may count — facts near the end of a key's history would be
    // wrongly-null/stale under any earlier batch's partial history, so
    // this fails if last-emission-wins (or the touched-key routing) is
    // broken.
    val dir = tempDir("graft_scd2_enrich_multi")
    val sliced = orders.withColumn("__slice",
      org.apache.spark.sql.functions.ntile(3).over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("o_orderdate"), col("o_orderkey"))))
    (1 to 3).foreach { i =>
      val slice = sliced.filter(col("__slice") === i).drop("__slice")
      val sliceDir = s"$dir/slice_$i"
      slice.coalesce(1).write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/orders_$i.parquet"))
    }
    // The fact table (events) rides along unstreamed — the enrich stream
    // reads it statically from the same dir.
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val multi = EventStreams.scd2EnrichStream(spark, dir,
      maxFilesPerTrigger = Some(1)).collect().map(_.toSeq).toSeq
    assert(multi == batch)
  }

  test("streaming near-dup admission settles to the one-shot screen, " +
      "single and multi-batch") {
    val docs = Tables.documents(spark, sf)
    val batch = graft.dedup.Dedup.incrementalNearDup(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0),
      docs.filter(pmod(col("doc_id"), lit(2)) === 1))
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty) // the fixture must exercise rejection

    val single = graft.streaming.DocumentStreams
      .nearDupAdmissionStream(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(single == batch)

    // Forced multi-batch: 3 files, one per trigger. Each odd doc is
    // screened in whichever batch its file arrives; verdicts depend only
    // on the persisted even-id index, so the union of emissions must be
    // carving-independent.
    val dir = tempDir("graft_neardup_multi")
    (0 until 3).foreach { i =>
      val sliceDir = s"$dir/slice_$i"
      docs.filter(pmod(col("doc_id"), lit(3)) === i).coalesce(1)
        .write.parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/documents_$i.parquet"))
    }
    val multi = graft.streaming.DocumentStreams
      .nearDupAdmissionStream(spark, dir, maxFilesPerTrigger = Some(1))
      .collect().map(_.toSeq).toSeq
    assert(multi == batch)
  }
}
