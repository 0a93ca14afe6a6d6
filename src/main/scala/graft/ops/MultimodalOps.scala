package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-shaped decode/feature-extract over
  * `mapPartitions`.
  *
  * Decode is a pluggable seam ([[MediaDecoder]]): [[CodecDecoder]]
  * parses REAL container bytes for the formats the JVM can honestly
  * round-trip (PCM16 WAV, 24-bpp BMP — see [[MediaCodecs]], pinned by
  * a JDK-differential spec and the m4/m5 analytic oracles);
  * [[FakeDecoder]] remains the clearly-marked deterministic stand-in
  * for formats that need a native library (MP4/FLAC — swap in a
  * JNI/FFmpeg/libvips call per partition in production). The iterator
  * shape (init-once-per-partition, stream rows through) already
  * matches what a native decoder needs.
  */
object MultimodalOps {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRow(
      asset_id: Long,
      media_type: String,       // "image" | "audio" | "video"
      content: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long])

  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      byte_len: Long,
      feature: Array[Float])    // fixed-dim embedding slot

  /** The decode seam: one asset row in, one feature row out. A
    * partition-level native context (FFmpeg handle, libvips pool)
    * belongs in the `mapPartitions` wrapper, not here — implementations
    * stay per-row and serializable. [[FakeDecoder]] is the
    * deterministic stand-in for formats with no pure-JVM codec;
    * [[CodecDecoder]] parses REAL WAV/BMP container bytes via
    * [[MediaCodecs]].
    */
  trait MediaDecoder extends Serializable {
    def decode(row: MediaRow): MediaFeatures
  }

  /** STUB decoder: ??? in production; here a deterministic fake that
    * derives an 8-dim "feature" from byte statistics so tests can pin
    * exact outputs. QUARANTINED to specs that construct it explicitly —
    * no default-argument call path reaches it ([[extractFeatures]]
    * defaults to [[CodecDecoder]], [[sampleFrames]] defaults to real
    * container decode); it stands in only for payloads that are not
    * real containers (e.g. [[mediaFromDocuments]]'s UTF-8 text bytes)
    * or formats that need a native library (MP4/FLAC); JPEG/PNG decode
    * is REAL via [[graft.ops.ImageIoCodecs]].
    */
  object FakeDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.content
      val n = bytes.length
      // one indexed pass, Long accumulators (byte sums are integers, so
      // Long is exact at any payload size; the old sequential Float32
      // sum drifted past the oracle's round() tolerance on large blobs)
      val sums = new Array[Long](8)
      var i = 0
      while (i < n) {
        sums(i % 8) += (bytes(i) & 0xff).toLong
        i += 1
      }
      val feature = Array.tabulate(8) { s =>
        if (n == 0) 0f else (sums(s).toDouble / n).toFloat
      }
      MediaFeatures(row.asset_id, row.media_type, n.toLong, feature)
    }

    /** STUB frame extraction: a deterministic 16-byte window of the
      * payload selected by timestamp (??? → real codec seek+decode).
      */
    def frameAt(row: MediaRow, tsMs: Long): Array[Byte] = {
      val bytes = row.content
      if (bytes.isEmpty) Array.emptyByteArray
      else {
        val start = ((tsMs % math.max(1, bytes.length))).toInt
        Array.tabulate(math.min(16, bytes.length))(i =>
          bytes((start + i) % bytes.length))
      }
    }
  }

  /** REAL-codec decoder: parses the payload as an actual media
    * container — PCM16 WAV for `audio`, sniffed BMP/PNG/JPEG for
    * `image` ([[graft.ops.ImageIoCodecs.decodeAny]]),
    * uncompressed 24-bpp AVI for `video` ([[MediaCodecs]], pure JVM) —
    * and derives the 8-dim feature from the DECODED
    * samples/pixels/frames, not the raw bytes. Malformed payloads and
    * unknown media types THROW — a training pipeline must quarantine
    * bad blobs explicitly (filter + try/catch at the call site), not
    * average them into features silently.
    */
  object CodecDecoder extends MediaDecoder {
    def decode(row: MediaRow): MediaFeatures = row.media_type match {
      case "audio" =>
        // sniff-and-route: FLAC magic → [[FlacCodec]]; otherwise
        // RIFF/WAVE — both decode to the same PCM16 stream shape, so
        // downstream features are container-independent
        val (samples, sampleRate, channels) =
          if (row.content.length >= 4 && row.content(0) == 'f' &&
              row.content(1) == 'L' && row.content(2) == 'a' &&
              row.content(3) == 'C') {
            val f = FlacCodec.decode(row.content)
            (f.samples, f.sampleRate, f.channels)
          } else {
            val w = MediaCodecs.WavCodec.decode(row.content)
            (w.samples, w.sampleRate, w.channels)
          }
        val n = samples.length
        var sum = 0L; var sumAbs = 0L; var peak = 0L
        var i = 0
        while (i < n) {
          val v = samples(i).toLong
          sum += v; sumAbs += math.abs(v); peak = math.max(peak, math.abs(v))
          i += 1
        }
        val feature = Array(
          n.toFloat, sampleRate.toFloat, channels.toFloat,
          if (n == 0) 0f else (sum.toDouble / n).toFloat,
          if (n == 0) 0f else (sumAbs.toDouble / n).toFloat,
          peak.toFloat, 0f, 0f)
        MediaFeatures(row.asset_id, row.media_type, row.content.length.toLong, feature)
      case "image" =>
        // sniff-and-route (BMP/PNG/JPEG): the BMP path is byte-law
        // identical to the original BmpCodec-only decode
        val bmp = ImageIoCodecs.decodeAny(row.content)
        val np = bmp.pixels.length
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < np) {
          val p = bmp.pixels(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        val feature = Array(
          bmp.width.toFloat, bmp.height.toFloat,
          (sr.toDouble / np).toFloat, (sg.toDouble / np).toFloat,
          (sb.toDouble / np).toFloat,
          ((sr + 2 * sg + sb).toDouble / (4.0 * np)).toFloat, 0f, 0f)
        MediaFeatures(row.asset_id, row.media_type, row.content.length.toLong, feature)
      case "video" =>
        val avi = MediaCodecs.AviCodec.decode(row.content)
        val nF = avi.frames.length
        val denom = avi.width.toDouble * avi.height * nF
        var sr = 0L; var sg = 0L; var sb = 0L
        var f = 0
        while (f < nF) {
          val px = avi.frames(f)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            i += 1
          }
          f += 1
        }
        val feature = Array(
          avi.width.toFloat, avi.height.toFloat, nF.toFloat,
          (sr / denom).toFloat, (sg / denom).toFloat, (sb / denom).toFloat,
          (avi.usPerFrame / 1000).toFloat, 0f)
        MediaFeatures(row.asset_id, row.media_type, row.content.length.toLong, feature)
      case other =>
        throw new IllegalArgumentException(s"unknown media type '$other'")
    }
  }

  /** Derive a media table from any (id, text) source: payload = UTF-8
    * bytes (stands in for real image/audio blobs at identical schema).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(640)).cast("int").as("width"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(480)).cast("int").as("height"),
      when(pmod(col("doc_id"), lit(3)) =!= 0, pmod(col("doc_id"), lit(10000)) * 100)
        .cast("long").as("duration_ms"))

  /** Real-payload twin of [[mediaFromDocuments]]: audio assets carry an
    * ACTUAL PCM16 RIFF/WAVE container, image assets an ACTUAL 24-bpp
    * BMP, and video assets an ACTUAL uncompressed 24-bpp RIFF/AVI
    * ([[MediaCodecs.syntheticWav]]/[[MediaCodecs.syntheticBmp]]/
    * [[MediaCodecs.syntheticAvi]] — decoded content analytic in doc_id,
    * so DuckDB oracles can recompute decoded statistics in closed
    * form). Metadata comes from the real containers: image/video
    * width/height are the DIB dims, audio duration is n_samples/8 ms at
    * 8 kHz, video duration is n_frames × 200 ms.
    */
  def mediaFromDocumentsReal(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 0 =>
          val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
          MediaRow(id, "image", MediaCodecs.syntheticBmp(id), Some(w), Some(h), None)
        case 1 =>
          val n = 64 + (id % 191)
          MediaRow(id, "audio", MediaCodecs.syntheticWav(id), None, None, Some(n * 1000L / 8000L))
        case _ =>
          val w = 4 + (id % 11).toInt; val h = 3 + (id % 5).toInt
          val nF = 2 + (id % 9).toInt
          MediaRow(id, "video", MediaCodecs.syntheticAvi(id),
            Some(w), Some(h), Some(nF * 200L))
      }
    }
  }

  /** One sampled frame: for video the payload is a STUB slice of the
    * source bytes (a codec would decode the real frame); for image
    * assets under `decodeImages` it is the REAL decoded pixel content.
    * Index/timestamp plumbing is real either way.
    */
  final case class FrameRow(
      asset_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** Frame sampling: one frame every `everyMs` over each video's
    * duration — a flatMap (narrow, no shuffle), so a 2-hour video fans
    * out to its frames inside its own partition and downstream ops see
    * a uniform (asset, frame) row shape.
    *
    * With `decodeVideo = true` (the DEFAULT — the codecs exist, so real
    * decode is the production path), a video asset's payload is parsed
    * as a REAL uncompressed AVI container ([[MediaCodecs.AviCodec]]):
    * each sampled timestamp selects the container frame covering it
    * (`min(nFrames−1, ts / framePeriod)`) and the emitted bytes are
    * that frame's DECODED top-down RGB pixel stream (w·h·3 bytes).
    * `decodeVideo = false` keeps the byte-window stub for non-container
    * payloads (e.g. [[mediaFromDocuments]]) — opt-in, spec-only; every
    * battery query and every default call path decodes.
    *
    * With `decodeImages = true` (also the default), an image asset is
    * treated as a single-frame video: its BMP payload is DECODED
    * ([[MediaCodecs.BmpCodec]]) and the one emitted frame's bytes are
    * the top-down RGB pixel stream, same contract as the video path.
    */
  def sampleFrames(media: DataFrame, everyMs: Long,
      decodeImages: Boolean = true,
      decodeVideo: Boolean = true): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    require(everyMs > 0, "everyMs must be positive")
    media.as[MediaRow].flatMap { m =>
      m.media_type match {
        case "video" if decodeVideo && m.content.nonEmpty =>
          val avi = MediaCodecs.AviCodec.decode(m.content)
          val periodMs = math.max(1L, avi.usPerFrame / 1000L)
          // the CONTAINER is the authority on duration (frames × period);
          // caller metadata that disagrees is a malformed row and fails
          // loudly like every other bad-payload path — silently trusting
          // it would over-sample (clamped to the last frame) or drop the
          // tail of the stream
          val duration = avi.frames.length * periodMs
          m.duration_ms.foreach { d =>
            require(d == duration,
              s"asset ${m.asset_id}: duration_ms metadata $d disagrees " +
                s"with the container (${avi.frames.length} frames x ${periodMs} ms = $duration)")
          }
          (0L until duration by everyMs).zipWithIndex.map { case (ts, i) =>
            val fIdx = math.min(avi.frames.length - 1L, ts / periodMs).toInt
            FrameRow(m.asset_id, i, ts, pixelsToRgb(avi.frames(fIdx)))
          }
        case "video" =>
          m.duration_ms match {
            case Some(d) if d > 0 =>
              (0L until d by everyMs).zipWithIndex.map { case (ts, i) =>
                FrameRow(m.asset_id, i, ts, FakeDecoder.frameAt(m, ts))
              }
            case _ => Iterator.empty
          }
        case "image" if decodeImages && m.content.nonEmpty =>
          val img = ImageIoCodecs.decodeAny(m.content)
          Iterator.single(FrameRow(m.asset_id, 0, 0L, pixelsToRgb(img.pixels)))
        case _ => Iterator.empty
      }
    }
  }

  /** Packed 0xRRGGBB pixels → interleaved top-down RGB byte stream. */
  private def pixelsToRgb(pixels: Array[Int]): Array[Byte] = {
    val rgb = new Array[Byte](pixels.length * 3)
    var i = 0
    while (i < pixels.length) {
      val p = pixels(i)
      rgb(3 * i) = ((p >> 16) & 0xff).toByte
      rgb(3 * i + 1) = ((p >> 8) & 0xff).toByte
      rgb(3 * i + 2) = (p & 0xff).toByte
      i += 1
    }
    rgb
  }

  /** REAL visual-media resize: decode the payload (BMP for images, the
    * whole AVI for videos), resample every frame
    * ([[MediaCodecs.Resample]] — floor-mapping nearest neighbor by
    * default, exact-integer align-corners bilinear on request), and
    * RE-ENCODE the container; width/height metadata come from the
    * actual re-encoded bytes (video keeps its frame count and period).
    * Audio rows pass through untouched; malformed payloads throw (same
    * quarantine contract as every decode path). Narrow typed map, no
    * shuffle — a native resampler (libvips/swscale) slots behind the
    * same row shape per partition.
    */
  def resize(media: DataFrame, width: Int, height: Int,
      bilinear: Boolean = false): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(width > 0 && height > 0, "target dims must be positive")
    def resample(px: Array[Int], sw: Int, sh: Int): Array[Int] =
      if (bilinear) MediaCodecs.Resample.bilinear(px, sw, sh, width, height)
      else MediaCodecs.Resample.nearest(px, sw, sh, width, height)
    media.as[MediaRow].map { m =>
      m.media_type match {
        case "image" =>
          // sniffed decode, re-encoded in the SOURCE container (a PNG
          // asset stays PNG; JPEG re-encode is lossy by its nature)
          val img = ImageIoCodecs.decodeAny(m.content)
          m.copy(content = ImageIoCodecs.encodeAs(img.format,
              resample(img.pixels, img.width, img.height), width, height),
            width = Some(width), height = Some(height))
        case "video" =>
          val avi = MediaCodecs.AviCodec.decode(m.content)
          val frames = avi.frames.map(resample(_, avi.width, avi.height))
          m.copy(content = MediaCodecs.AviCodec.encode(
              frames, width, height, avi.usPerFrame),
            width = Some(width), height = Some(height))
        case _ => m
      }
    }.toDF()
  }

  /** REAL audio resample: decode the WAV payload, nearest-sample rate
    * conversion ([[MediaCodecs.Resample.nearestAudio]]), re-encode at
    * the target rate; duration metadata recomputed from the actual
    * re-encoded stream. Non-audio rows pass through untouched. Narrow
    * typed map, no shuffle — the audio member of the resize family
    * ([[resize]] covers image + video).
    */
  def resampleAudio(media: DataFrame, dstRate: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(dstRate > 0, "target rate must be positive")
    media.as[MediaRow].map { m =>
      if (m.media_type != "audio") m
      else {
        val wav = MediaCodecs.WavCodec.decode(m.content)
        val out = MediaCodecs.Resample.nearestAudio(
          wav.samples, wav.sampleRate, dstRate, wav.channels)
        m.copy(
          content = MediaCodecs.WavCodec.encode(out, dstRate, wav.channels),
          duration_ms = Some(out.length.toLong * 1000L /
            (dstRate.toLong * wav.channels)))
      }
    }.toDF()
  }

  /** Batch decode: shard by content hash so hot assets spread evenly
    * (no skew from one giant video), then decode per partition with the
    * iterator shape a native decoder wants (no per-row init, no
    * collect).
    */
  def extractFeatures(media: DataFrame, shards: Int = 0,
      decoder: MediaDecoder = CodecDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val sharded =
      if (shards > 0) media.repartition(shards, xxhash64(col("asset_id")))
      else media
    sharded.as[MediaRow].mapPartitions { rows =>
      // init per-partition decoder context here (native lib handle)
      rows.map(decoder.decode)
    }
  }
}
