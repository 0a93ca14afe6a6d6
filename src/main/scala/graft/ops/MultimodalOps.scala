package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch-shaped decode/feature-extract over
  * `mapPartitions`.
  *
  * Container note (per the brief): no media codecs ship in this
  * environment, so [[FakeDecoder]] is a clearly-marked deterministic
  * stand-in — the Spark-side plumbing (schema, shard partitioning, batch
  * iterator shape, feature schema) is real and tested. Swap `decode`
  * with a JNI/FFmpeg/libvips call per partition in production; the
  * iterator shape (init-once-per-partition, stream rows through)
  * already matches what a native decoder needs.
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

  /** STUB decoder: ??? in production; here a deterministic fake that
    * derives an 8-dim "feature" from byte statistics so tests can pin
    * exact outputs.
    */
  object FakeDecoder {
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

  /** One sampled video frame: payload is a STUB slice of the source
    * bytes (a codec would decode the real frame); index/timestamp
    * plumbing is real.
    */
  final case class FrameRow(
      asset_id: Long, frame_idx: Int, ts_ms: Long, frame: Array[Byte])

  /** Frame sampling: one frame every `everyMs` over each video's
    * duration — a flatMap (narrow, no shuffle), so a 2-hour video fans
    * out to its frames inside its own partition and downstream ops see
    * a uniform (asset, frame) row shape.
    */
  def sampleFrames(media: DataFrame, everyMs: Long): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    require(everyMs > 0, "everyMs must be positive")
    media.as[MediaRow].flatMap { m =>
      m.duration_ms match {
        case Some(d) if m.media_type == "video" && d > 0 =>
          (0L until d by everyMs).zipWithIndex.map { case (ts, i) =>
            FrameRow(m.asset_id, i, ts, FakeDecoder.frameAt(m, ts))
          }
        case _ => Iterator.empty
      }
    }
  }

  /** Resize plumbing: metadata transform + STUB re-encode (production
    * swaps the identity payload for a libvips/swscale call inside the
    * same row shape). Non-image rows pass through untouched.
    */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame =
    media.withColumn("width",
        when(col("media_type") === "image", lit(width)).otherwise(col("width")))
      .withColumn("height",
        when(col("media_type") === "image", lit(height)).otherwise(col("height")))

  /** Batch decode: shard by content hash so hot assets spread evenly
    * (no skew from one giant video), then decode per partition with the
    * iterator shape a native decoder wants (no per-row init, no
    * collect).
    */
  def extractFeatures(media: DataFrame, shards: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val sharded =
      if (shards > 0) media.repartition(shards, xxhash64(col("asset_id")))
      else media
    sharded.as[MediaRow].mapPartitions { rows =>
      // init per-partition decoder context here (native lib handle)
      rows.map(FakeDecoder.decode)
    }
  }
}
