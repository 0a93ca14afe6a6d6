package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SparkTestSession
import graft.ops.ImageIoCodecs.{JpegCodec, PngCodec}

/** PNG/JPEG codec contract: PNG round-trips bit-exact (lossless), JPEG
  * preserves dimensions exactly and channel statistics approximately,
  * sniffing dispatch routes BMP/PNG/JPEG correctly, malformed bytes
  * throw (quarantine contract), and the compressed formats compose
  * through the real Spark paths (extractFeatures / resize / frame
  * sampling) with results equal to the same raster's BMP twin.
  */
class ImageIoCodecsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def raster(w: Int, h: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h) { idx =>
      val x = idx % w; val y = idx / w
      val r = ((seed + 7L * x + 13L * y) % 256L).toInt
      val g = ((3L * seed + 5L * x + y) % 256L).toInt
      val b = ((11L * seed + x + 2L * y) % 256L).toInt
      (r << 16) | (g << 8) | b
    }

  test("PNG round-trip is pixel-exact (lossless)") {
    val (w, h) = (13, 9)
    val px = raster(w, h, seed = 42L)
    val bytes = PngCodec.encode(px, w, h)
    assert(ImageIoCodecs.sniff(bytes) == "png")
    val back = PngCodec.decode(bytes)
    assert(back.width == w && back.height == h && back.format == "png")
    assert(back.pixels.toSeq == px.toSeq)
  }

  test("JPEG: dimensions exact, channel means within lossy tolerance") {
    val (w, h) = (32, 24)
    val px = raster(w, h, seed = 7L)
    val bytes = JpegCodec.encode(px, w, h, quality = 0.95f)
    assert(ImageIoCodecs.sniff(bytes) == "jpeg")
    val back = JpegCodec.decode(bytes)
    assert(back.width == w && back.height == h && back.format == "jpeg")
    def means(p: Array[Int]): (Double, Double, Double) = {
      var r = 0L; var g = 0L; var b = 0L
      p.foreach { v => r += (v >> 16) & 0xff; g += (v >> 8) & 0xff; b += v & 0xff }
      (r.toDouble / p.length, g.toDouble / p.length, b.toDouble / p.length)
    }
    val (r0, g0, b0) = means(px)
    val (r1, g1, b1) = means(back.pixels)
    assert(math.abs(r0 - r1) < 8 && math.abs(g0 - g1) < 8 && math.abs(b0 - b1) < 8,
      s"JPEG channel means drifted: ($r0,$g0,$b0) vs ($r1,$g1,$b1)")
  }

  test("decodeAny sniffs and routes: BMP result identical to BmpCodec") {
    val (w, h) = (11, 5)
    val px = raster(w, h, seed = 3L)
    val bmpBytes = MediaCodecs.BmpCodec.encode(px, w, h)
    val viaAny = ImageIoCodecs.decodeAny(bmpBytes)
    val viaBmp = MediaCodecs.BmpCodec.decode(bmpBytes)
    assert(viaAny.format == "bmp")
    assert(viaAny.width == viaBmp.width && viaAny.height == viaBmp.height)
    assert(viaAny.pixels.toSeq == viaBmp.pixels.toSeq)
  }

  test("malformed bytes throw, not silently decode") {
    intercept[IllegalArgumentException] {
      ImageIoCodecs.decodeAny(Array[Byte](1, 2, 3, 4, 5))
    }
    // valid PNG magic, garbage body → ImageIO returns null → throw
    val fake = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      9, 9, 9, 9, 9, 9, 9, 9)
    intercept[Exception] { ImageIoCodecs.decodeAny(fake) }
    intercept[IllegalArgumentException] {
      ImageIoCodecs.encodeAs("tiff", raster(2, 2, 0L), 2, 2)
    }
  }

  test("syntheticPng decodes to the analytic m5/m9 pixel law") {
    (0L to 20L).foreach { id =>
      val img = ImageIoCodecs.decodeAny(ImageIoCodecs.syntheticPng(id))
      val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
      assert(img.width == w && img.height == h && img.format == "png")
      assert(img.pixels.toSeq == raster(w, h, id).toSeq)
    }
  }

  test("extractFeatures over PNG equals the same raster's BMP twin") {
    import spark.implicits._
    val rows = (0L until 30L).map { id =>
      val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
      val px = raster(w, h, id)
      (MultimodalOps.MediaRow(id, "image", PngCodec.encode(px, w, h),
          Some(w), Some(h), None),
        MultimodalOps.MediaRow(id, "image", MediaCodecs.BmpCodec.encode(px, w, h),
          Some(w), Some(h), None))
    }
    val png = MultimodalOps.extractFeatures(rows.map(_._1).toDF(), shards = 4)
      .collect().map(f => f.asset_id -> f.feature.toSeq).toMap
    val bmp = MultimodalOps.extractFeatures(rows.map(_._2).toDF(), shards = 4)
      .collect().map(f => f.asset_id -> f.feature.toSeq).toMap
    assert(png.keySet == bmp.keySet && png.nonEmpty)
    png.foreach { case (id, f) => assert(f == bmp(id), s"asset $id features differ") }
  }

  test("resize keeps the source container and matches the BMP resample") {
    import spark.implicits._
    val ids = (0L until 25L)
    val media = ids.map { id =>
      MultimodalOps.MediaRow(id, "image", ImageIoCodecs.syntheticPng(id),
        Some(4 + (id % 13).toInt), Some(3 + (id % 7).toInt), None)
    }.toDF()
    val resized = MultimodalOps.resize(media, width = 8, height = 5)
      .as[MultimodalOps.MediaRow].collect()
    assert(resized.length == ids.length)
    resized.foreach { m =>
      val img = ImageIoCodecs.decodeAny(m.content)
      assert(img.format == "png" && img.width == 8 && img.height == 5)
      val w = 4 + (m.asset_id % 13).toInt; val h = 3 + (m.asset_id % 7).toInt
      val expect = MediaCodecs.Resample.nearest(
        raster(w, h, m.asset_id), w, h, 8, 5)
      assert(img.pixels.toSeq == expect.toSeq, s"asset ${m.asset_id}")
    }
  }

  test("sampleFrames decodes a PNG image to its RGB pixel stream") {
    import spark.implicits._
    val media = Seq(MultimodalOps.MediaRow(
      5L, "image", ImageIoCodecs.syntheticPng(5L), Some(9), Some(8), None)).toDF()
    val frames = MultimodalOps.sampleFrames(media, everyMs = 1000).collect()
    assert(frames.length == 1)
    val px = raster(9, 8, 5L)
    val expect = px.flatMap(p => Array(
      ((p >> 16) & 0xff).toByte, ((p >> 8) & 0xff).toByte, (p & 0xff).toByte))
    assert(frames.head.frame.toSeq == expect.toSeq)
  }
}
