package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.etl.SparkTestSession

/** Perceptual image dHash + Hamming-banded near-dup pairs: clone law,
  * banding completeness vs brute force, and re-encode tolerance (the
  * property that makes the hash PERCEPTUAL — a lossy JPEG round trip
  * of a smooth image moves few gradient signs).
  */
class ImageDHashSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dhash(bytes: Array[Byte]): Long = {
    val v = graft.functions.ImageDHash.compute(bytes)
    assert(v != null, "fixture must decode")
    v.longValue()
  }

  /** Smooth two-axis gradient — low-frequency content, the regime
    * where dHash is designed to survive lossy re-encoding.
    */
  private def smoothRaster(w: Int, h: Int, phase: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = math.min(255, (x * 255) / math.max(1, w - 1))
      val g = math.min(255, (y * 255) / math.max(1, h - 1))
      val b = math.min(255, (phase + (x + y) * 128 / math.max(1, w + h - 2)))
      (r << 16) | (g << 8) | b
    }

  test("dHash is container-invariant for lossless codecs: BMP == PNG " +
      "of the same raster; clones hash identically") {
    for (id <- Seq(0L, 7L, 23L, 64L)) {
      val png = ImageIoCodecs.syntheticPng(id)
      assert(dhash(png) == dhash(png.clone()), "determinism")
      val img = ImageIoCodecs.decodeAny(png)
      val bmp = MediaCodecs.BmpCodec.encode(img.pixels, img.width, img.height)
      assert(dhash(bmp) == dhash(png),
        s"id=$id: BMP and PNG of one raster must hash equal")
    }
  }

  test("undecodable bytes hash to null and are excluded from pairs") {
    assert(graft.functions.ImageDHash.compute("not an image".getBytes) == null)
    val df = Seq(
      (1L, ImageIoCodecs.syntheticPng(5L)),
      (2L, ImageIoCodecs.syntheticPng(5L)),
      (3L, "garbage!".getBytes)).toDF("doc_id", "img")
    val got = DedupOps.imageNearDupPairs(df, "doc_id", "img", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), "clones pair; garbage is dropped, not fatal")
  }

  test("banded pairs equal brute-force Hamming pairs; 10-way clones all pair at 0") {
    val imgs = (0L until 100L).map(id =>
      id -> ImageIoCodecs.syntheticPng(id - id % 10))
    val df = imgs.toDF("doc_id", "img")
    for (maxDist <- Seq(1, 3, 7)) {
      val hashes = imgs.map { case (id, b) => id -> dhash(b) }
      val brute = (for {
        (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= maxDist
      } yield (ia, ib, d)).toSet
      val got = DedupOps.imageNearDupPairs(df, "doc_id", "img", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute, s"maxDist=$maxDist")
      // the clone law: every within-decade pair present at distance 0
      val clonePairs = (for {
        base <- 0L until 100L by 10; a <- base until base + 10
        b <- a + 1 until base + 10
      } yield (a, b, 0)).toSet
      assert(clonePairs.subsetOf(got), "all 10-way replicas must pair exactly")
    }
  }

  test("JPEG re-encode tolerance: a high-quality lossy round trip of a " +
      "smooth image stays within a small Hamming radius of the original") {
    val dists = for (phase <- Seq(0, 40, 90, 130)) yield {
      val (w, h) = (64, 48)
      val px = smoothRaster(w, h, phase)
      val png = ImageIoCodecs.PngCodec.encode(px, w, h)
      val jpg = ImageIoCodecs.JpegCodec.encode(px, w, h, quality = 0.92f)
      java.lang.Long.bitCount(dhash(png) ^ dhash(jpg))
    }
    assert(dists.forall(_ <= 3),
      s"re-encoded smooth images must stay within the banding radius, got $dists")
    // and the pair search finds the (png, jpeg) twin at maxDist=3
    val (w, h) = (64, 48)
    val px = smoothRaster(w, h, 40)
    val df = Seq(
      (1L, ImageIoCodecs.PngCodec.encode(px, w, h)),
      (2L, ImageIoCodecs.JpegCodec.encode(px, w, h, 0.92f))).toDF("doc_id", "img")
    val got = DedupOps.imageNearDupPairs(df, "doc_id", "img", maxDist = 3)
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
  }
}
