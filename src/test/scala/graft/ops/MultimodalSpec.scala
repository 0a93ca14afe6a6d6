package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.etl.SparkTestSession

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("media table schema and deterministic fake features") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = MultimodalOps.mediaFromDocuments(docs)
    assert(media.schema("content").dataType.typeName == "binary")
    // text-byte payloads are NOT containers: the fake decoder is the
    // explicit opt-in here (the default is CodecDecoder)
    val feats = MultimodalOps.extractFeatures(media, shards = 4,
      decoder = MultimodalOps.FakeDecoder)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.feature.length == 8))
    // deterministic: same input → same features
    val again = MultimodalOps.extractFeatures(media, shards = 2,
      decoder = MultimodalOps.FakeDecoder).collect()
    val byId = again.map(r => r.asset_id -> r.feature.toSeq).toMap
    assert(rows.forall(r => byId(r.asset_id) == r.feature.toSeq))
    // byte_len matches utf-8 length of the source text
    val lens = docs.selectExpr("doc_id", "CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.take(20).foreach { r => assert(r.byte_len == lens(r.asset_id)) }
  }

  test("frame sampling: one frame per interval, videos only, deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = MultimodalOps.mediaFromDocuments(docs)
    // text-byte payloads are not containers: the byte-window stub is the
    // explicit opt-in (defaults decode real containers)
    val frames = MultimodalOps.sampleFrames(media, everyMs = 100000,
      decodeImages = false, decodeVideo = false).collect()
    assert(frames.nonEmpty)
    // only video assets produce frames; count = ceil(duration/interval)
    val durations = media.where("media_type = 'video' AND duration_ms > 0")
      .selectExpr("asset_id", "duration_ms")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byAsset = frames.groupBy(_.asset_id)
    assert(byAsset.keySet == durations.keySet)
    byAsset.foreach { case (id, fs) =>
      val expected = (durations(id) + 100000 - 1) / 100000
      assert(fs.length == expected, s"asset $id: ${fs.length} frames, expected $expected")
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
      assert(fs.forall(_.frame.length <= 16))
    }
    // deterministic across runs
    val again = MultimodalOps.sampleFrames(media, everyMs = 100000,
      decodeImages = false, decodeVideo = false).collect()
    assert(again.map(f => (f.asset_id, f.frame_idx, f.frame.toSeq)).toSet ==
      frames.map(f => (f.asset_id, f.frame_idx, f.frame.toSeq)).toSet)
  }

  test("extractFeatures with CodecDecoder: real WAV/BMP payloads through the Dataset path") {
    import spark.implicits._
    val rows = (0L until 40L).map { i =>
      if (i % 2 == 0)
        MultimodalOps.MediaRow(i, "audio", MediaCodecs.syntheticWav(i),
          None, None, Some(1000L))
      else
        MultimodalOps.MediaRow(i, "image", MediaCodecs.syntheticBmp(i),
          Some(640), Some(480), None)
    }
    val media = rows.toDS().toDF()
    val feats = MultimodalOps
      .extractFeatures(media, shards = 4, decoder = MultimodalOps.CodecDecoder)
      .collect().map(f => f.asset_id -> f).toMap
    assert(feats.size == rows.size)
    rows.foreach { r =>
      val expect = MultimodalOps.CodecDecoder.decode(r)
      val got = feats(r.asset_id)
      assert(got.feature.toSeq == expect.feature.toSeq &&
        got.byte_len == expect.byte_len, s"asset ${r.asset_id}")
    }
    // audio features really come from the decoded stream, not byte stats
    val wav = MediaCodecs.WavCodec.decode(rows.head.content)
    assert(feats(0L).feature(0) == wav.samples.length.toFloat)
  }

  test("CodecDecoder sniffs FLAC audio: the same PCM stream yields the " +
      "same features whether it arrives as WAV or FLAC") {
    // smooth signal: FIXED predictors win, so the FLAC payload really
    // compresses (the size assertion below would not hold for noise)
    val samples = Array.tabulate[Short](300)(i =>
      (2000.0 * math.sin(i / 9.0)).toShort)
    val asWav = MultimodalOps.CodecDecoder.decode(MultimodalOps.MediaRow(
      1L, "audio", MediaCodecs.WavCodec.encode(samples, 8000), None, None, None))
    val asFlac = MultimodalOps.CodecDecoder.decode(MultimodalOps.MediaRow(
      2L, "audio", FlacCodec.encode(samples, 8000, 64), None, None, None))
    assert(asWav.feature.toSeq == asFlac.feature.toSeq,
      "container must not leak into the decoded-stream features")
    assert(asFlac.byte_len < asWav.byte_len,
      "FLAC payload should be smaller than raw PCM16 for correlated data")
  }

  test("mediaFromDocumentsReal: payloads are real containers that round-trip the codecs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(30)
    val media = MultimodalOps.mediaFromDocumentsReal(docs).collect()
    assert(media.length == 30)
    media.foreach { m =>
      (m.asset_id % 3) match {
        case 0 =>
          assert(m.media_type == "image")
          val bmp = MediaCodecs.BmpCodec.decode(m.content)
          assert(m.width.contains(bmp.width) && m.height.contains(bmp.height))
        case 1 =>
          assert(m.media_type == "audio")
          val wav = MediaCodecs.WavCodec.decode(m.content)
          assert(m.duration_ms.contains(wav.samples.length * 1000L / 8000L))
        case _ =>
          assert(m.media_type == "video")
          val avi = MediaCodecs.AviCodec.decode(m.content)
          assert(m.width.contains(avi.width) && m.height.contains(avi.height))
          assert(m.duration_ms.contains(avi.frames.length * 200L))
      }
    }
  }

  test("sampleFrames(decodeVideo): sampled frames are DECODED RGB of the covering container frame") {
    import spark.implicits._
    val ids = Seq(2L, 5L, 8L, 11L)
    val media = ids.map { id =>
      val nF = 2 + (id % 9).toInt
      MultimodalOps.MediaRow(id, "video", MediaCodecs.syntheticAvi(id),
        None, None, Some(nF * 200L))
    }.toDS().toDF()
    val frames = MultimodalOps.sampleFrames(media, everyMs = 300L, decodeVideo = true)
      .collect().groupBy(_.asset_id)
    assert(frames.keySet == ids.toSet)
    ids.foreach { id =>
      val avi = MediaCodecs.AviCodec.decode(MediaCodecs.syntheticAvi(id))
      val nF = avi.frames.length
      val expectSamples = (nF * 200L + 299L) / 300L
      val fs = frames(id).sortBy(_.frame_idx)
      assert(fs.length == expectSamples, s"asset $id")
      fs.foreach { fr =>
        assert(fr.ts_ms == fr.frame_idx * 300L)
        val srcFrame = math.min(nF - 1L, fr.ts_ms / 200L).toInt
        val px = avi.frames(srcFrame)
        assert(fr.frame.length == px.length * 3)
        // spot-check first and last pixel, RGB interleave
        Seq(0, px.length - 1).foreach { i =>
          assert((fr.frame(3 * i) & 0xff) == ((px(i) >> 16) & 0xff))
          assert((fr.frame(3 * i + 1) & 0xff) == ((px(i) >> 8) & 0xff))
          assert((fr.frame(3 * i + 2) & 0xff) == (px(i) & 0xff))
        }
      }
    }
  }

  test("sampleFrames(decodeImages): the emitted frame is the DECODED top-down RGB stream") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 6L, 9L, 12L)
    val media = ids.map { id =>
      MultimodalOps.MediaRow(id, "image", MediaCodecs.syntheticBmp(id), None, None, None)
    }.toDS().toDF()
    val frames = MultimodalOps.sampleFrames(media, everyMs = 5000L, decodeImages = true)
      .collect().map(f => f.asset_id -> f).toMap
    assert(frames.keySet == ids.toSet)
    ids.foreach { id =>
      val bmp = MediaCodecs.BmpCodec.decode(MediaCodecs.syntheticBmp(id))
      val fr = frames(id)
      assert(fr.frame_idx == 0 && fr.ts_ms == 0L)
      assert(fr.frame.length == bmp.width * bmp.height * 3)
      // spot-check pixel (x=1, y=1), top-down row-major RGB interleave
      val idx = bmp.width + 1
      val p = bmp.pixels(idx)
      assert((fr.frame(3 * idx) & 0xff) == ((p >> 16) & 0xff))
      assert((fr.frame(3 * idx + 1) & 0xff) == ((p >> 8) & 0xff))
      assert((fr.frame(3 * idx + 2) & 0xff) == (p & 0xff))
    }
    // with image decode off, image assets emit nothing (m3's video-only
    // contract — the stub paths are explicit opt-ins now)
    assert(MultimodalOps.sampleFrames(media, everyMs = 5000L,
      decodeImages = false, decodeVideo = false).count() == 0L)
  }

  test("resampleAudio: WAV re-encoded at the target rate with the mapped " +
      "samples and recomputed duration; non-audio rows untouched") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(30)
    val media = MultimodalOps.mediaFromDocumentsReal(docs).toDF()
    val out = MultimodalOps.resampleAudio(media, dstRate = 3000)
      .as[MultimodalOps.MediaRow].collect().map(m => m.asset_id -> m).toMap
    val src = media.as[MultimodalOps.MediaRow].collect()
    src.foreach { m =>
      val r = out(m.asset_id)
      if (m.media_type == "audio") {
        val wavIn = MediaCodecs.WavCodec.decode(m.content)
        val wavOut = MediaCodecs.WavCodec.decode(r.content)
        assert(wavOut.sampleRate == 3000)
        assert(wavOut.samples.toSeq == MediaCodecs.Resample.nearestAudio(
          wavIn.samples, wavIn.sampleRate, 3000).toSeq)
        assert(r.duration_ms.contains(wavOut.samples.length * 1000L / 3000L))
      } else {
        assert(r.content.toSeq == m.content.toSeq &&
          r.duration_ms == m.duration_ms,
          s"non-audio row ${m.asset_id} must pass through untouched")
      }
    }
  }

  test("sampleFrames: duration_ms metadata that disagrees with the decoded " +
      "container fails loudly (the container is the authority)") {
    import spark.implicits._
    val id = 5L
    val nF = 2 + (id % 9).toInt
    val good = Seq(MultimodalOps.MediaRow(id, "video",
      MediaCodecs.syntheticAvi(id), None, None, Some(nF * 200L))).toDS().toDF()
    assert(MultimodalOps.sampleFrames(good, everyMs = 300L).count() > 0)
    // absent metadata: duration comes from the container alone
    val absent = Seq(MultimodalOps.MediaRow(id, "video",
      MediaCodecs.syntheticAvi(id), None, None, None)).toDS().toDF()
    assert(MultimodalOps.sampleFrames(absent, everyMs = 300L).count() ==
      MultimodalOps.sampleFrames(good, everyMs = 300L).count())
    // lying metadata: would silently over-sample the clamped last frame —
    // must throw instead, like every other malformed-payload path
    val lying = Seq(MultimodalOps.MediaRow(id, "video",
      MediaCodecs.syntheticAvi(id), None, None, Some(nF * 200L + 1000L))).toDS().toDF()
    val ex = intercept[org.apache.spark.SparkException](
      MultimodalOps.sampleFrames(lying, everyMs = 300L).count())
    assert(String.valueOf(ex.getCause).contains("disagrees"), String.valueOf(ex.getCause))
  }

  test("resize REALLY resamples: image AND video payloads re-encoded at " +
      "target dims with floor-mapped pixels; audio passes through untouched") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(60)
    val media = MultimodalOps.mediaFromDocumentsReal(docs).toDF()
    val resized = MultimodalOps.resize(media, 8, 5)
      .as[MultimodalOps.MediaRow]
      .collect().map(m => m.asset_id -> m).toMap
    val source = media.as[MultimodalOps.MediaRow]
      .collect().map(m => m.asset_id -> m).toMap
    assert(resized.size == source.size)
    source.values.foreach { m =>
      val r = resized(m.asset_id)
      m.media_type match {
        case "image" =>
          assert(r.width.contains(8) && r.height.contains(5))
          val out = MediaCodecs.BmpCodec.decode(r.content)
          assert(out.width == 8 && out.height == 5,
            s"re-encoded container must carry the target dims: ${out.width}x${out.height}")
          // every output pixel is the floor-mapped source pixel
          val src = MediaCodecs.BmpCodec.decode(m.content)
          val expect = MediaCodecs.Resample.nearest(
            src.pixels, src.width, src.height, 8, 5)
          assert(out.pixels.toSeq == expect.toSeq, s"asset ${m.asset_id}")
        case "video" =>
          assert(r.width.contains(8) && r.height.contains(5))
          val out = MediaCodecs.AviCodec.decode(r.content)
          val src = MediaCodecs.AviCodec.decode(m.content)
          assert(out.width == 8 && out.height == 5)
          assert(out.frames.length == src.frames.length &&
            out.usPerFrame == src.usPerFrame,
            "frame count and period must survive the resize")
          src.frames.zip(out.frames).zipWithIndex.foreach { case ((s, o), f) =>
            assert(o.toSeq == MediaCodecs.Resample.nearest(
              s, src.width, src.height, 8, 5).toSeq,
              s"asset ${m.asset_id} frame $f")
          }
        case _ =>
          assert(r.content.toSeq == m.content.toSeq &&
            r.width == m.width && r.height == m.height &&
            r.duration_ms == m.duration_ms,
            s"audio row ${m.asset_id} must pass through untouched")
      }
    }
  }
}
