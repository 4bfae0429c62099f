package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (build-target extension): image/audio/video
  * payloads are opaque `binary` columns travelling next to typed metadata;
  * decode / feature-extraction runs partition-batched so one task touches
  * many payloads without per-row overhead.
  *
  * Decode kernels, in order:
  *  - IMAGES are decoded for real via `javax.imageio` (pure-JVM, works
  *    offline: PNG/BMP/GIF/JPEG) and featurized as a normalized luminance
  *    histogram — see [[decodeImage]].
  *  - Everything else (audio/video — no codecs ship in the JVM) falls back
  *    to [[fakeDecode]], a deterministic stand-in that keeps the Spark-side
  *    plumbing (schema, batching, partitioning, feature shape) real and
  *    testable. Swapping in a real codec changes only the kernel.
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

  /** Real image decode (javax.imageio — PNG/BMP/GIF/JPEG, pure JVM, no
    * native codecs needed) → a `dim`-bin luminance histogram normalized by
    * pixel count: a deterministic, resolution-independent signature.
    * Returns None when the payload is not a decodable image (ImageIO probes
    * the magic bytes and returns null fast), letting the caller fall back
    * to [[fakeDecode]] for non-image payloads. */
  private[multimodal] def decodeImage(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new Array[Float](dim)
        val (w, h) = (img.getWidth, img.getHeight)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            // Rec.601 integer luma over 0..255.
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            out(math.min(lum * dim / 256, dim - 1)) += 1.0f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        Some(out.map(_ / n))
      }
    } catch { case _: Exception => None }

  /** STUB decode for payload types with no pure-JVM codec (audio/video): a
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

  /** Partition-batched feature extraction: mapPartitions keeps the decoder's
    * per-batch setup cost amortized across all rows of a task — the Scala
    * analog of pandas-batched UDFs. Output is a typed Dataset so downstream
    * gets a static schema. Images decode for real ([[decodeImage]]); other
    * payloads take the deterministic stub path. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"), col("n_bytes"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { rows =>
        // Per-partition codec setup: ImageIO scans its plugin registry once
        // per JVM; disabling the disk cache keeps decode purely in-memory.
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, payload, nBytes) =>
          val feats = decodeImage(payload, dim).getOrElse(fakeDecode(payload, dim))
          MediaFeatures(id, nBytes, feats)
        }
      }
  }

  /** A sampled frame: parent media id, frame position, frame payload. */
  final case class FrameRow(media_id: Long, frame_idx: Int, n_frames: Int, frame: Array[Byte])

  /** REAL image resize (pure JVM, offline): decode via javax.imageio,
    * bilinear-rescale on a Graphics2D canvas, re-encode as PNG. Returns
    * None for non-image payloads (caller passes them through untouched).
    */
  private[multimodal] def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val scaled = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = scaled.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(scaled, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** Batch image resize over a media table: images are decoded, rescaled
    * and re-encoded for real; non-image payloads pass through untouched
    * (n_bytes updated either way). Partition-batched like
    * [[extractFeatures]] — decoder setup amortizes across a task's rows. */
  def resizeImages(spark: SparkSession, media: DataFrame, w: Int, h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"), col("n_bytes"))
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, payload, mime, _) =>
          val out = resizeImage(payload, w, h).getOrElse(payload)
          MediaRow(id, out, mime, out.length.toLong)
        }
      }
  }

  /** Frame size (bytes) the stub frame extractor slices on. */
  val StubFrameBytes = 256

  /** Evenly-spaced frame sampling over "video" payloads — the standard
    * pre-processing step before per-frame feature extraction at corpus
    * scale (decode every Nth frame, never the whole video).
    *
    * Frame DECODE is a STUB (a bare JVM ships no video codecs): the
    * payload is treated as `ceil(len/256)` concatenated 256-byte frames
    * and a sampled frame is the corresponding byte slice — deterministic
    * and shape-faithful, so the Spark-side contract (one output row per
    * sampled frame, partition-batched, bounded `maxFrames` fan-out) is
    * fully real and tested. A production build swaps the slicing for a
    * codec's keyframe iterator; nothing else changes. */
  def sampleFrames(spark: SparkSession, media: DataFrame, maxFrames: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    require(maxFrames >= 1, "sampleFrames: maxFrames must be >= 1")
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // Real codec initialization would happen once per partition here.
        rows.flatMap { case (id, payload) =>
          val n = math.max(1, (payload.length + StubFrameBytes - 1) / StubFrameBytes)
          val k = math.min(maxFrames, n)
          // Evenly spaced, always including the first frame; distinct
          // because the index sequence is strictly increasing for k <= n.
          val indices =
            if (k == 1) Seq(0)
            else (0 until k).map(j => ((n - 1).toLong * j / (k - 1)).toInt).distinct
          indices.map { i =>
            val from = i * StubFrameBytes
            val until = math.min(payload.length, from + StubFrameBytes)
            FrameRow(id, i, n, java.util.Arrays.copyOfRange(payload, from, until))
          }
        }
      }
  }

  /** An audio row: PCM payload + the typed metadata a real ingest carries. */
  final case class AudioRow(media_id: Long, payload: Array[Byte],
      sample_rate: Int, n_bytes: Long)

  /** Per-clip audio features, all integer-exact (see [[audioFeatures]]). */
  final case class AudioFeatures(media_id: Long, n_samples: Long,
      n_frames: Long, total_energy: Long, peak_frame: Long,
      peak_energy: Long, n_zero_cross: Long)

  /** Deterministic 16-bit little-endian PCM synth — the STUB "decoder
    * output" for audio (a bare JVM ships no audio codecs; javax.sound
    * handles WAV headers but the fixture has no real recordings). Sample i
    * of clip `id` is `((id*31 + i²*7) mod 65536) - 32768` — a quadratic
    * chirp whose wrap rate grows with i, so zero crossings and frame
    * energies genuinely vary per clip: pure integer
    * arithmetic, so the downstream feature pipeline is exactly
    * reproducible by any engine — the DuckDB oracle recomputes the same
    * signal from the formula and q117 is hash-checked end-to-end, unlike a
    * rows-only stub. A production build replaces this with the codec's
    * PCM output; every byte past this function is real plumbing. */
  private[multimodal] def synthPcm(id: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((id * 31 + i.toLong * i * 7) % 65536) - 32768).toInt
      out(2 * i) = (s & 0xFF).toByte
      out(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    out
  }

  /** Manufacture an audio table from the documents fixture: one synthetic
    * PCM16 clip per document, 2048 + (doc_id mod 1024) samples (clip
    * lengths vary so framing edge cases are exercised). In production this
    * column comes straight from parquet `binary`. Partition-batched like
    * every codec path here. */
  def audioFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[AudioRow] = {
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = (2048 + id % 1024).toInt
        val pcm = synthPcm(id, n)
        AudioRow(id, pcm, 16000, pcm.length.toLong)
      }
    }
  }

  /** Frame/hop sizes for [[audioFeatures]] — the standard 32 ms / 16 ms
    * split at 16 kHz. */
  val AudioFrameSamples = 512
  val AudioHopSamples = 256

  /** Partition-batched audio featurization over opaque PCM16 payloads —
    * the audio analog of [[extractFeatures]]: decode bytes → samples, cut
    * into overlapping 512-sample frames at hop 256, and report per clip
    *   n_samples, n_frames, total frame energy (sum over frames of
    *   sum(s²) — overlap double-counts by construction, as framed
    *   spectral pipelines do), the peak frame (lowest index wins ties)
    *   and its energy, and the signal's strict zero-crossing count
    *   (s[i]·s[i+1] < 0).
    * Everything is 64-bit integer math (|s| ≤ 2^15 ⇒ a frame sums to
    * < 2^39; a clip to < 2^43) — no float drift, so results are exact and
    * engine-independent. One pass per payload, no shuffle at all until
    * the caller aggregates: the scale shape is a map-only job over
    * whatever partitioning the binary column arrived with. */
  def audioFeatures(spark: SparkSession, audio: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.mapPartitions { rows =>
      // Real codec/DSP setup (FFT plans, decoder contexts) would
      // initialize once per partition here.
      rows.map { a =>
        val bytes = a.payload
        val n = bytes.length / 2
        val s = new Array[Int](n)
        var i = 0
        while (i < n) {
          s(i) = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort.toInt
          i += 1
        }
        val nFrames = if (n >= AudioFrameSamples)
          (n - AudioFrameSamples) / AudioHopSamples + 1 else 0
        var total = 0L
        var peak = 0L
        var peakF = 0L
        var f = 0
        while (f < nFrames) {
          var e = 0L
          var j = f * AudioHopSamples
          val end = j + AudioFrameSamples
          while (j < end) { e += s(j).toLong * s(j); j += 1 }
          total += e
          if (e > peak) { peak = e; peakF = f.toLong }
          f += 1
        }
        var zc = 0L
        i = 0
        while (i < n - 1) {
          if (s(i).toLong * s(i + 1) < 0) zc += 1
          i += 1
        }
        AudioFeatures(a.media_id, n.toLong, nFrames.toLong, total, peakF, peak, zc)
      }
    }
  }

  /** End-to-end: media table → features → per-mime stats (exercises the
    * typed path back into relational aggregation). Content-collapsed
    * ([[graft.text.TextOps.perDistinctContent]], probe-routed): the
    * payload here is a pure function of the document text, so on a
    * duplicated corpus the decode — the entire cost — runs once per
    * distinct text instead of once per copy; ~unique corpora bypass. */
  def mediaFeatureStats(spark: SparkSession, documents: DataFrame, dim: Int = 16): DataFrame =
    graft.text.TextOps.perDistinctContent(documents, Seq("text")) { reps =>
      extractFeatures(spark, mediaFromDocuments(reps), dim).toDF()
        .select(
          col("media_id").as("doc_id"),
          col("n_bytes"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"),
          size(col("feature")).as("feature_dim"))
    }.select(
      col("doc_id").as("media_id"),
      col("n_bytes"), col("f0"), col("feature_dim"))
      .orderBy("media_id")

  /** [[audioFeatures]] routed through a PAYLOAD-content collapse — the
    * multimodal analog of [[graft.text.TextOps.perDistinctContent]]:
    * featurization is a pure function of (payload bytes), so on a corpus
    * where many clips carry byte-identical PCM the decode+DSP pass — the
    * entire cost — runs once per distinct payload and the results fan
    * back to members over (md5(payload), sample_rate) equi-joins. The
    * same duplication probe routes ~unique corpora straight to the
    * direct path, so the collapse tax is paid only where repaid.
    *
    * WHEN TO USE WHICH (measured, sf3 replicated corpus): this collapse
    * pays only when the payload column is STORED (parquet binary) — then
    * the extra group-by-content passes are cheap column re-scans and the
    * decode+DSP runs once per distinct clip. When the payload is itself
    * produced by upstream compute (as in the q117 fixture, where the
    * decode stub synthesizes PCM), every md5/grouping pass re-runs that
    * compute and the collapse LOSES (18 s vs 6 s direct at sf3) — q117
    * therefore stays on [[audioFeatures]] directly. */
  def audioFeaturesByContent(spark: SparkSession, audio: Dataset[AudioRow]): DataFrame = {
    import spark.implicits._
    val df = audio.toDF()
    if (!graft.text.TextOps.duplicationHeavy(df, Seq("payload", "sample_rate")))
      return audioFeatures(spark, audio).toDF()
    val withG = df.withColumn("__gid", md5(col("payload")))
    val members = withG.select(col("__gid"), col("sample_rate"),
      col("media_id").as("__member_id"))
    val repIds = withG.groupBy(col("__gid"), col("sample_rate"))
      .agg(min(col("media_id")).as("media_id"))
    val reps = withG.join(repIds, Seq("__gid", "sample_rate", "media_id"))
    val repMap = reps.select(col("__gid"), col("sample_rate"),
      col("media_id").as("__rep_id"))
    val out = audioFeatures(spark,
      reps.select(col("media_id"), col("payload"), col("sample_rate"),
        col("n_bytes")).as[AudioRow]).toDF()
    val outCols = out.columns.toSeq
    out.join(repMap, out("media_id") === repMap("__rep_id"))
      .join(members, Seq("__gid", "sample_rate"))
      .select(outCols.map {
        case "media_id" => col("__member_id").as("media_id")
        case c => col(c)
      }: _*)
  }
}
