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

  test("real image payloads decode via javax.imageio to luminance histograms") {
    import spark.implicits._
    // Synthesize PNGs in-memory: an all-black and an all-white 8x8 image,
    // plus a half-black/half-white one. Expected histograms are exact.
    def png(pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, pixel(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val black = png((_, _) => 0x000000)
    val white = png((_, _) => 0xFFFFFF)
    val half = png((x, _) => if (x < 4) 0x000000 else 0xFFFFFF)
    val media = Seq(
      (1L, black, "image/png", black.length.toLong),
      (2L, white, "image/png", white.length.toLong),
      (3L, half, "image/png", half.length.toLong))
      .toDF("media_id", "payload", "mime", "n_bytes")
    val feats = Multimodal.extractFeatures(spark, media, dim = 16)
      .collect().sortBy(_.media_id).map(_.feature.toSeq)
    // All-black: every pixel in bin 0; all-white: bin 15; half: 0.5 each.
    assert(feats(0)(0) == 1.0f && feats(0).sum == 1.0f)
    assert(feats(1)(15) == 1.0f && feats(1).sum == 1.0f)
    assert(feats(2)(0) == 0.5f && feats(2)(15) == 0.5f)
  }

  test("image resize really rescales: 16x16 PNG in, 8x8 PNG out") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, if (x < 8) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val media = Seq((1L, png, "image/png", png.length.toLong))
      .toDF("media_id", "payload", "mime", "n_bytes")
    val out = Multimodal.resizeImages(spark, media, 8, 8).collect().head
    val decoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.payload))
    assert(decoded.getWidth == 8 && decoded.getHeight == 8)
    assert(out.n_bytes == out.payload.length.toLong)
    // Non-image payloads pass through byte-identical.
    val txt = "not an image".getBytes("UTF-8")
    val media2 = Seq((2L, txt, "text/plain", txt.length.toLong))
      .toDF("media_id", "payload", "mime", "n_bytes")
    assert(Multimodal.resizeImages(spark, media2, 8, 8).collect().head.payload.toSeq == txt.toSeq)
  }

  test("frame sampling: bounded evenly-spaced fan-out, exact byte slices") {
    import spark.implicits._
    val payload = Array.tabulate(1000)(i => (i % 251).toByte) // 4 frames (256B each)
    val media = Seq((7L, payload, "video/raw", 1000L))
      .toDF("media_id", "payload", "mime", "n_bytes")
    val frames = Multimodal.sampleFrames(spark, media, maxFrames = 3).collect()
      .sortBy(_.frame_idx)
    assert(frames.length == 3)                       // min(maxFrames, 4)
    assert(frames.map(_.n_frames).toSet == Set(4))
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 3)) // evenly spaced incl. ends
    assert(frames.head.frame.toSeq == payload.slice(0, 256).toSeq)
    assert(frames.last.frame.toSeq == payload.slice(768, 1000).toSeq)
    // A payload smaller than one frame yields exactly one whole-payload frame.
    val tiny = Seq((8L, Array[Byte](1, 2, 3), "video/raw", 3L))
      .toDF("media_id", "payload", "mime", "n_bytes")
    val tf = Multimodal.sampleFrames(spark, tiny, maxFrames = 4).collect()
    assert(tf.length == 1 && tf.head.frame.toSeq == Seq[Byte](1, 2, 3))
  }

  test("non-image payloads fall back to the deterministic stub kernel") {
    import spark.implicits._
    val bytes = "definitely not an image".getBytes("UTF-8")
    val media = Seq((7L, bytes, "application/octet-stream", bytes.length.toLong))
      .toDF("media_id", "payload", "mime", "n_bytes")
    val got = Multimodal.extractFeatures(spark, media, dim = 4).collect().head.feature
    val want = new Array[Float](4)
    bytes.zipWithIndex.foreach { case (b, i) => want(i % 4) += (b & 0xFF) / 255.0f }
    assert(got.toSeq == want.toSeq)
  }

  test("audio synth PCM is exact little-endian int16 of the chirp formula") {
    import spark.implicits._
    val id = 5L
    val docs = Seq((id, "x")).toDF("doc_id", "text")
    val row = Multimodal.audioFromDocuments(spark, docs).collect().head
    val n = (2048 + id % 1024).toInt
    assert(row.media_id == id && row.sample_rate == 16000)
    assert(row.payload.length == 2 * n && row.n_bytes == 2L * n)
    (0 until n).foreach { i =>
      val want = (((id * 31 + i.toLong * i * 7) % 65536) - 32768).toInt
      val got = ((row.payload(2 * i) & 0xFF) | (row.payload(2 * i + 1) << 8)).toShort.toInt
      assert(got == want, s"sample $i: $got != $want")
    }
  }

  test("audio features match a naive reference loop on a hand-built clip") {
    import spark.implicits._
    // 1200 samples: enough for 3 overlapping 512/256 frames (starts 0, 256,
    // 512); values vary sign so zero-crossings are non-trivial.
    val s = Array.tabulate(1200)(i => ((i * 37) % 257) - 128)
    val pcm = new Array[Byte](2400)
    s.indices.foreach { i =>
      pcm(2 * i) = (s(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((s(i) >> 8) & 0xFF).toByte
    }
    // Independent naive computation (straight loops, no shared code).
    val frames = (0 to 2).map { f =>
      (f * 256 until f * 256 + 512).map(i => s(i).toLong * s(i)).sum
    }
    val wantTotal = frames.sum
    val wantPeak = frames.max
    val wantPeakF = frames.indexOf(wantPeak).toLong
    val wantZc = (0 until 1199).count(i => s(i).toLong * s(i + 1) < 0).toLong
    val audio = Seq(Multimodal.AudioRow(42L, pcm, 16000, 2400L)).toDS()
    val got = Multimodal.audioFeatures(spark, audio).collect().head
    assert(got.n_samples == 1200L && got.n_frames == 3L)
    assert(got.total_energy == wantTotal && got.peak_energy == wantPeak)
    assert(got.peak_frame == wantPeakF && got.n_zero_cross == wantZc)
    // Sub-frame clips report zero frames, not an error.
    val tiny = Seq(Multimodal.AudioRow(1L, pcm.take(100), 16000, 100L)).toDS()
    val t = Multimodal.audioFeatures(spark, tiny).collect().head
    assert(t.n_samples == 50L && t.n_frames == 0L && t.total_energy == 0L)
  }

  test("audio payload collapse equals the direct path on a duplicated corpus") {
    import spark.implicits._
    // Ids straddling the synth's 65536-period: ids 3 and 65539 carry
    // byte-identical PCM, so the collapsed route featurizes one of them
    // and fans the result back; 7 is unique. Duplication 50% > the probe
    // threshold, so the COLLAPSE route genuinely runs.
    val ids = Seq(3L, 65539L, 7L, 65543L, 11L, 65547L)
    val docs = ids.map(i => (i, s"t$i")).toDF("doc_id", "text")
    val audio = Multimodal.audioFromDocuments(spark, docs)
    val direct = Multimodal.audioFeatures(spark, audio)
      .toDF().orderBy("media_id").collect().map(_.toSeq).toSeq
    val collapsed = Multimodal.audioFeaturesByContent(spark, audio)
      .orderBy("media_id").collect().map(_.toSeq).toSeq
    assert(collapsed == direct)
    assert(collapsed.map(_.head) == ids.sorted)
  }

  test("streaming tumbling aggregation equals the batch result") {
    val streamed = EventStreams.tumblingHourlyStream(spark, sf)
      .select("window_start", "n_events", "sum_value").collect()
    val batch = Events.tumblingHourly(Tables.events(spark, sf))
      .select("window_start", "n_events", "sum_value").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("token budget cap admits exactly the greedy per-source prefix") {
    val docs = Tables.documents(spark, sf)
    val budget = 1000L
    val got = graft.ops.Curation.tokenBudgetCap(docs, budget).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("n_tokens"), r.getAs[Long]("cum_tokens")))
    // Driver-side greedy simulation over the same ordering.
    val all = docs.selectExpr("doc_id", "source", "size(split(text, ' ')) AS n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)
    val want = all.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.toSeq.sortBy(_._1).flatMap { case (id, _, n) =>
        cum += n
        if (cum <= budget) Some((id, src, n, cum)) else None
      }
    }.toSet
    // Greedy-prefix semantics: a doc over budget is dropped but its tokens
    // still count toward the running total (cumulative window, not knapsack).
    assert(got.toSet == want)
    assert(got.forall(_._4 <= budget))
    assert(got.nonEmpty && got.length < all.length) // budget actually binds
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

  test("forward fill: dense grid, zeros on gaps, last observation carried, hand-checked") {
    import spark.implicits._
    // User 1: events at 00:10 (v=2.5) and 03:40 (v=1.0) — hours 01 and 02
    // are gaps that must appear with n_events=0 carrying 2.5 forward.
    val ev = Seq(
      (1L, "2024-01-01 00:10:00", 2.5),
      (1L, "2024-01-01 03:40:00", 1.0),
      (2L, "2024-01-01 05:00:00", 4.0))
      .toDF("user_id", "ts_s", "value")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"), col("value"))
    val out = Events.forwardFillHourly(ev).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01 00:00:00.0", 1L, 2.5),
      (1L, "2024-01-01 01:00:00.0", 0L, 2.5),
      (1L, "2024-01-01 02:00:00.0", 0L, 2.5),
      (1L, "2024-01-01 03:00:00.0", 1L, 1.0),
      (2L, "2024-01-01 05:00:00.0", 1L, 4.0)))

    // Fixture-level invariants: grid density (every user's span is fully
    // covered, no holes) and event conservation.
    val events = Tables.events(spark, sf)
    val filled = Events.forwardFillHourly(events)
    val perUser = filled.groupBy("user_id")
      .agg(count(lit(1)).as("n_rows"), min("hour").as("h0"), max("hour").as("h1"),
        sum("n_events").as("n_ev"))
      .collect()
    perUser.foreach { r =>
      val hours = (r.getTimestamp(3).getTime - r.getTimestamp(2).getTime) / 3600000 + 1
      assert(r.getLong(1) == hours, s"user ${r.getLong(0)}: grid has holes")
    }
    val total = events.filter(col("user_id") < 100).count()
    assert(perUser.map(_.getLong(4)).sum == total)
  }

  test("eventTransitions counts per-user bigrams with exact probabilities") {
    import spark.implicits._
    // u1: view -> click -> view; u2: view -> click. Bigrams:
    // (view,click) x2, (click,view) x1. From 'view' total 2 -> p=1.0;
    // from 'click' total 1 -> p=1.0. Add a same-instant tie resolved by
    // event_id: u3 two events at one ts -> order (id 31, 32).
    val ev = Seq(
      (11L, 1L, "2024-01-01 00:00:00", "view"),
      (12L, 1L, "2024-01-01 00:01:00", "click"),
      (13L, 1L, "2024-01-01 00:02:00", "view"),
      (21L, 2L, "2024-01-01 00:00:00", "view"),
      (22L, 2L, "2024-01-01 00:01:00", "click"),
      (31L, 3L, "2024-01-01 00:00:00", "error"),
      (32L, 3L, "2024-01-01 00:00:00", "signup"))
      .toDF("event_id", "user_id", "t", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("t")).as("ts"), col("event_type"))
    val out = Events.eventTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      ("view", "click") -> ((2L, 1.0)),
      ("click", "view") -> ((1L, 1.0)),
      ("error", "signup") -> ((1L, 1.0))))
  }

  test("sessionPaths walks sessions in event order; boundary semantics pinned") {
    import spark.implicits._
    // The sessionizer splits on gap >= 5 minutes — so an event arriving at
    // EXACTLY last+5:00 starts a NEW session. This is the q80-oracle
    // convention, enforced by the explicit lag-based split (session_window
    // would merge the exact-boundary event; on second-quantized production
    // logs that divergence is real, not measure-zero).
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (2L, 1L, "2024-01-01 00:04:00", "click"),
      (3L, 1L, "2024-01-01 00:09:00.000000", "purchase"), // exactly +5:00 -> splits
      (4L, 2L, "2024-01-01 10:00:00", "view"),
      (5L, 2L, "2024-01-01 10:04:59.999999", "click")) // just inside the gap -> merges
      .toDF("event_id", "user_id", "t", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("t")).as("ts"), col("event_type"))
    val out = graft.ops.Events.sessionPaths(ev).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("view>click", 2L), ("purchase", 1L)))
  }

  test("lastTouchAttribution picks the latest prior touch inside the window") {
    import spark.implicits._
    // u1: click at t0, purchase at t0+1h (attributed to the click),
    // purchase at t0+2h (attributed to the SAME click — purchases are
    // not touches), view 10 days before a later purchase (outside the
    // 7-day window -> null attribution).
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "click"),
      (2L, 1L, "2024-01-01 01:00:00", "purchase"),
      (3L, 1L, "2024-01-01 02:00:00", "purchase"),
      (4L, 2L, "2024-01-01 00:00:00", "view"),
      (5L, 2L, "2024-01-11 00:00:00", "purchase"),
      (6L, 3L, "2024-01-01 00:00:00", "purchase"))
      .toDF("event_id", "user_id", "t", "event_type")
      .select(col("event_id"), col("user_id"),
        to_timestamp(col("t")).as("ts"), col("event_type"))
    val out = Events.lastTouchAttribution(ev).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(3)),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(out(2L) == ((Some("click"), Some(1L), Some(3600000000L))))
    assert(out(3L) == ((Some("click"), Some(1L), Some(7200000000L))))
    assert(out(5L) == ((None, None, None)))
    assert(out(6L) == ((None, None, None)))
    assert(out.size == 4)
  }
}
