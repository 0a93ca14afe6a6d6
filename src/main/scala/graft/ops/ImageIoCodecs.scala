package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** JPEG/PNG codecs over `javax.imageio` (public JDK surface) — the
  * compressed-image members of the multimodal decode family. Real
  * crawled corpora are overwhelmingly JPEG/PNG, not BMP; these slot
  * behind the same [[MultimodalOps.MediaDecoder]] seam and the same
  * quarantine contract (malformed bytes THROW; the pipeline filters or
  * try/catches explicitly, never averages garbage into features).
  *
  * Container dispatch is by MAGIC BYTES ([[sniff]]), not metadata: a
  * 100 TB crawl's `content` column carries whatever the fetcher saved,
  * and trusting a sidecar mime column silently misdecodes mislabeled
  * blobs. [[decodeAny]] therefore sniffs and routes — BMP to the
  * pure-JVM [[MediaCodecs.BmpCodec]], PNG/JPEG to ImageIO — and
  * [[encodeAs]] re-encodes in the SOURCE container so a resize
  * round-trips the user's format.
  *
  * Scale notes: decode stays a narrow per-row kernel inside
  * `mapPartitions` (no shuffle, no driver involvement); ImageIO's
  * disk-backed stream cache is disabled once per JVM ([[initIo]]) so
  * 32 executor threads don't serialize on temp-file creation per
  * image. PNG is lossless — round-trip is bit-exact, so PNG assets
  * keep the engine's integer-exact oracle discipline (m9). JPEG is
  * lossy by design: decode of a given byte stream is deterministic,
  * but encode→decode only preserves channel statistics approximately,
  * so JPEG correctness is pinned by tolerance specs, not hash oracles.
  */
object ImageIoCodecs {

  /** Decoded raster: row-major top-down packed 0xRRGGBB, same shape as
    * [[MediaCodecs.BmpData]], plus the sniffed source container.
    */
  final case class ImageData(
      width: Int, height: Int, pixels: Array[Int], format: String)

  /** One-time per-JVM ImageIO setup. `setUseCache(false)` keeps
    * encode/decode fully in-memory — the default writes a temp cache
    * file per stream, which at thousands of images per partition is
    * pure I/O overhead (and a /tmp contention point on a shared
    * executor host).
    */
  private lazy val initIo: Unit = ImageIO.setUseCache(false)

  /** Container from magic bytes: `BM` → bmp, the 8-byte PNG signature
    * → png, `FF D8 FF` → jpeg. Anything else throws — same loud-fail
    * contract as every decode path.
    */
  def sniff(bytes: Array[Byte]): String = {
    def b(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 54 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (bytes.length >= 8 && b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a) "png"
    else if (bytes.length >= 3 && b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) "jpeg"
    else throw new IllegalArgumentException(
      s"unrecognized image container (${bytes.length} bytes)")
  }

  private def readViaImageIo(bytes: Array[Byte], fmt: String): ImageData = {
    initIo
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null)
      throw new IllegalArgumentException(s"malformed $fmt stream")
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < px.length) { px(i) &= 0xffffff; i += 1 }
    ImageData(w, h, px, fmt)
  }

  private def toBuffered(pixels: Array[Int], width: Int, height: Int): BufferedImage = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"pixel buffer ${pixels.length} != ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, pixels, 0, width)
    img
  }

  object PngCodec {
    /** Lossless PNG encode of a packed-RGB raster. */
    def encode(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
      initIo
      val out = new ByteArrayOutputStream(64 + pixels.length)
      ImageIO.write(toBuffered(pixels, width, height), "png", out)
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): ImageData = {
      require(sniff(bytes) == "png", "not a PNG stream")
      readViaImageIo(bytes, "png")
    }
  }

  object JpegCodec {
    /** Baseline JPEG encode at an explicit quality (default 0.92 —
      * the writer's own default is container-version dependent, and a
      * pipeline that re-encodes petabytes should pin it).
      */
    def encode(pixels: Array[Int], width: Int, height: Int,
        quality: Float = 0.92f): Array[Byte] = {
      initIo
      require(quality > 0f && quality <= 1f, "quality in (0, 1]")
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(quality)
      val out = new ByteArrayOutputStream(1024)
      val ios = new MemoryCacheImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.write(null, new IIOImage(toBuffered(pixels, width, height), null, null), param)
        ios.flush()
      } finally {
        writer.dispose()
        ios.close()
      }
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): ImageData = {
      require(sniff(bytes) == "jpeg", "not a JPEG stream")
      readViaImageIo(bytes, "jpeg")
    }
  }

  /** Sniff-and-route decode: BMP through the pure-JVM codec (bit-law
    * identical to before PNG/JPEG existed), PNG/JPEG through ImageIO.
    */
  def decodeAny(bytes: Array[Byte]): ImageData = sniff(bytes) match {
    case "bmp" =>
      val b = MediaCodecs.BmpCodec.decode(bytes)
      ImageData(b.width, b.height, b.pixels, "bmp")
    case fmt => readViaImageIo(bytes, fmt)
  }

  /** Re-encode a raster in the given container — the resize family
    * uses this to hand back the SAME format it was given.
    */
  def encodeAs(format: String, pixels: Array[Int], width: Int, height: Int): Array[Byte] =
    format match {
      case "bmp"  => MediaCodecs.BmpCodec.encode(pixels, width, height)
      case "png"  => PngCodec.encode(pixels, width, height)
      case "jpeg" => JpegCodec.encode(pixels, width, height)
      case other  => throw new IllegalArgumentException(s"unknown image format '$other'")
    }

  /** PNG twin of [[MediaCodecs.syntheticBmp]]: the SAME analytic pixel
    * law — (4 + id%13) × (3 + id%7), r = (id + 7x + 13y) mod 256,
    * g = (3id + 5x + y) mod 256, b = (11id + x + 2y) mod 256 — encoded
    * as a real PNG. PNG is lossless, so decoded channel statistics are
    * computable in closed form by the DuckDB oracle exactly as for BMP
    * (m9), proving the ImageIO decode path end-to-end.
    */
  def syntheticPng(docId: Long): Array[Byte] = {
    require(docId >= 0, "synthetic payloads are defined for non-negative ids")
    val w = 4 + (docId % 13).toInt
    val h = 3 + (docId % 7).toInt
    val pixels = Array.tabulate(w * h) { idx =>
      val x = idx % w; val y = idx / w
      val r = ((docId + 7L * x + 13L * y) % 256L).toInt
      val g = ((3L * docId + 5L * x + y) % 256L).toInt
      val b = ((11L * docId + x + 2L * y) % 256L).toInt
      (r << 16) | (g << 8) | b
    }
    PngCodec.encode(pixels, w, h)
  }
}
