package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MediaCodecs.{AviCodec, BmpCodec, WavCodec}

/** Differential tests of the pure-Scala WAV/BMP codecs against the
  * JDK's own, independently-written codecs (`javax.sound.sampled` and
  * `javax.imageio`) — BOTH directions, so a bug that a symmetric
  * encode/decode pair would cancel out (wrong data offset, skipped
  * padding, flipped byte order) is caught by the foreign implementation.
  */
class MediaCodecsSpec extends AnyFunSuite {

  private def shorts(n: Int, seed: Int): Array[Short] =
    Array.tabulate(n)(i => (((seed * 2654435761L + i * 40503L) % 65536L) - 32768L).toShort)

  // ------------------------------------------------------------- WAV

  test("WAV: our encode is readable by the JDK decoder, sample-exact") {
    val samples = shorts(777, seed = 5)
    val bytes = WavCodec.encode(samples, sampleRate = 8000)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(bytes))
    val f = ais.getFormat
    assert(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
    assert(f.getSampleRate == 8000f && f.getChannels == 1 &&
      f.getSampleSizeInBits == 16 && !f.isBigEndian)
    assert(ais.getFrameLength == samples.length.toLong)
    val raw = ais.readAllBytes()
    val back = java.nio.ByteBuffer.wrap(raw)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val decoded = new Array[Short](samples.length)
    back.get(decoded)
    assert(decoded.toSeq == samples.toSeq)
  }

  test("WAV: the JDK encoder's output is decodable by ours, sample-exact") {
    val samples = shorts(513, seed = 9)
    val fmt = new javax.sound.sampled.AudioFormat(44100f, 16, 2, true, false)
    // interleave as stereo frames: the 513 shorts become ~256 L/R frames
    val frames = samples.length / 2
    val raw = java.nio.ByteBuffer.allocate(frames * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until frames * 2).foreach(i => raw.putShort(samples(i)))
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(raw.array()), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val w = WavCodec.decode(bos.toByteArray)
    assert(w.sampleRate == 44100 && w.channels == 2)
    assert(w.samples.toSeq == samples.take(frames * 2).toSeq)
  }

  test("WAV: chunk walker skips foreign chunks (odd-size, padded) before data") {
    val samples = shorts(100, seed = 3)
    val canonical = WavCodec.encode(samples, 16000)
    // splice an odd-sized LIST chunk between fmt and data: decoders that
    // assume samples start at byte 44 break here
    val head = canonical.slice(0, 36) // RIFF..WAVE + fmt chunk
    val tail = canonical.drop(36) // data chunk
    val junk = "junk!".getBytes("US-ASCII") // 5 bytes, odd → 1 pad byte
    val chunk = java.nio.ByteBuffer.allocate(8 + junk.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("LIST".getBytes("US-ASCII")).putInt(junk.length).put(junk).put(0.toByte)
    val spliced = head ++ chunk.array() ++ tail
    // fix the RIFF size field to cover the splice
    val fixed = spliced.clone()
    java.nio.ByteBuffer.wrap(fixed).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val w = WavCodec.decode(fixed)
    assert(w.sampleRate == 16000 && w.samples.toSeq == samples.toSeq)
  }

  test("WAV: malformed streams throw, never return garbage") {
    val good = WavCodec.encode(shorts(8, 1), 8000)
    intercept[IllegalArgumentException](WavCodec.decode(good.take(20))) // truncated
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    intercept[IllegalArgumentException](WavCodec.decode(notRiff))
    val eightBit = good.clone()
    java.nio.ByteBuffer.wrap(eightBit).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(34, 8.toShort) // bits-per-sample field
    intercept[IllegalArgumentException](WavCodec.decode(eightBit))
  }

  // ------------------------------------------------------------- BMP

  private def pattern(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { idx =>
      val x = idx % w; val y = idx / w
      (((seed + 7 * x + 13 * y) % 256) << 16) |
        (((3 * seed + 5 * x + y) % 256) << 8) |
        ((11 * seed + x + 2 * y) % 256)
    }

  test("BMP: our encode is readable by ImageIO, pixel-exact (incl. padded widths)") {
    for ((w, h) <- Seq((5, 3), (4, 4), (7, 2), (1, 1))) { // 5,7 exercise row padding
      val px = pattern(w, h, seed = w * 31 + h)
      val bytes = BmpCodec.encode(px, w, h)
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO could not parse our ${w}x$h BMP")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xffffff) == px(y * w + x),
          s"pixel ($x,$y) of ${w}x$h")
    }
  }

  test("BMP: ImageIO's own BMP writer output is decodable by ours, pixel-exact") {
    val (w, h) = (6, 5)
    val px = pattern(w, h, seed = 42)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(y * w + x))
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos), "no JDK BMP writer")
    val decoded = BmpCodec.decode(bos.toByteArray)
    assert(decoded.width == w && decoded.height == h)
    assert(decoded.pixels.toSeq == px.toSeq)
  }

  test("BMP: negative height means top-down rows; decode flips accordingly") {
    val (w, h) = (4, 3)
    val px = pattern(w, h, seed = 7)
    val bytes = BmpCodec.encode(px, w, h).clone()
    // declare top-down WITHOUT reordering the stored (bottom-up) rows →
    // the decoded image must come back vertically flipped
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -h)
    val flipped = BmpCodec.decode(bytes)
    val expect = Array.tabulate(w * h) { idx =>
      val x = idx % w; val y = idx / w
      px((h - 1 - y) * w + x)
    }
    assert(flipped.pixels.toSeq == expect.toSeq)
  }

  test("BMP: malformed streams throw, never return garbage") {
    val good = BmpCodec.encode(pattern(4, 3, 1), 4, 3)
    intercept[IllegalArgumentException](BmpCodec.decode(good.take(40))) // truncated
    val notBmp = good.clone(); notBmp(0) = 'X'.toByte
    intercept[IllegalArgumentException](BmpCodec.decode(notBmp))
    val thirtyTwo = good.clone()
    java.nio.ByteBuffer.wrap(thirtyTwo).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(28, 32.toShort) // bpp field
    intercept[IllegalArgumentException](BmpCodec.decode(thirtyTwo))
    // hostile width that wraps width*3 past Int: 0x55555556*3 ≡ 2, so an
    // Int-arithmetic stride would pass the overrun guard and attempt a
    // ~5.7 GB pixel allocation; the Long-stride guard must reject it
    val hostile = new Array[Byte](58)
    val hb = java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hb.put('B'.toByte).put('M'.toByte).putInt(58).putInt(0)
      .putInt(54) // data offset
      .putInt(40) // header size
      .putInt(0x55555556) // width
      .putInt(1) // height
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0) // BI_RGB
    val ex = intercept[IllegalArgumentException](BmpCodec.decode(hostile))
    assert(ex.getMessage.contains("exceed") || ex.getMessage.contains("overruns"),
      ex.getMessage)
    // hostile width×height whose stride·rows product wraps Long negative
    // (Int.Max × Int.Max ≈ 1.4e19 > Long.Max): a product-only guard
    // would pass the wrapped value and attempt an impossible allocation
    val wrap = new Array[Byte](58)
    val wb = java.nio.ByteBuffer.wrap(wrap).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wb.put('B'.toByte).put('M'.toByte).putInt(58).putInt(0)
      .putInt(54).putInt(40)
      .putInt(Int.MaxValue).putInt(Int.MaxValue)
      .putShort(1).putShort(24).putInt(0)
    val ex2 = intercept[IllegalArgumentException](BmpCodec.decode(wrap))
    assert(ex2.getMessage.contains("exceed"), ex2.getMessage)
  }

  // ------------------------------------------------------------- AVI

  private def aviFrames(n: Int, w: Int, h: Int, seed: Int): Array[Array[Int]] =
    Array.tabulate(n)(f => pattern(w, h, seed = seed + 37 * f))

  test("AVI: encode/decode round-trips dims, frame period, and every pixel") {
    for ((w, h, n) <- Seq((5, 3, 4), (4, 4, 1), (7, 2, 9), (1, 1, 2))) {
      val frames = aviFrames(n, w, h, seed = w * 131 + h)
      val bytes = AviCodec.encode(frames, w, h, usPerFrame = 200000)
      val back = AviCodec.decode(bytes)
      assert(back.width == w && back.height == h && back.usPerFrame == 200000)
      assert(back.frames.length == n)
      (0 until n).foreach(f =>
        assert(back.frames(f).toSeq == frames(f).toSeq, s"frame $f of ${w}x$h×$n"))
    }
  }

  test("AVI: chunk walker skips foreign chunks (JUNK before movi, odd-size padded)") {
    val frames = aviFrames(3, 5, 3, seed = 11)
    val canonical = AviCodec.encode(frames, 5, 3, usPerFrame = 100000)
    // splice an odd-sized JUNK chunk between the hdrl LIST and the movi
    // LIST: decoders that assume movi starts at the canonical offset break
    val headEnd = 12 + 200 // RIFF header + hdrl LIST
    val junk = "junkie!".getBytes("US-ASCII") // 7 bytes, odd → 1 pad byte
    val chunk = java.nio.ByteBuffer.allocate(8 + junk.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("JUNK".getBytes("US-ASCII")).putInt(junk.length).put(junk).put(0.toByte)
    val spliced = canonical.take(headEnd) ++ chunk.array() ++ canonical.drop(headEnd)
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val back = AviCodec.decode(spliced)
    assert(back.frames.length == 3)
    (0 until 3).foreach(f => assert(back.frames(f).toSeq == frames(f).toSeq))
  }

  test("AVI: negative strf height means top-down rows; decode flips accordingly") {
    val (w, h) = (4, 3)
    val frames = aviFrames(2, w, h, seed = 23)
    val bytes = AviCodec.encode(frames, w, h, usPerFrame = 200000).clone()
    // strf biHeight lives at: 12 + 8 hdrl-LIST-head + 4 'hdrl' + 64 avih +
    // 8 strl-LIST-head + 4 'strl' + 64 strh + 8 strf-head + 8 = 180
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(180, -h)
    val flipped = AviCodec.decode(bytes)
    val expect = frames.map { px =>
      Array.tabulate(w * h) { idx => px((h - 1 - idx / w) * w + idx % w) }
    }
    (0 until 2).foreach(f => assert(flipped.frames(f).toSeq == expect(f).toSeq))
  }

  test("AVI: malformed streams throw, never return garbage") {
    val good = AviCodec.encode(aviFrames(2, 4, 3, 1), 4, 3, usPerFrame = 200000)
    intercept[IllegalArgumentException](AviCodec.decode(good.take(100))) // truncated
    val notAvi = good.clone(); notAvi(8) = 'X'.toByte
    intercept[IllegalArgumentException](AviCodec.decode(notAvi))
    val thirtyTwo = good.clone()
    java.nio.ByteBuffer.wrap(thirtyTwo).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(186, 32.toShort) // strf bpp field
    intercept[IllegalArgumentException](AviCodec.decode(thirtyTwo))
    val compressed = good.clone()
    java.nio.ByteBuffer.wrap(compressed).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(188, 1) // strf biCompression = BI_RLE8
    intercept[IllegalArgumentException](AviCodec.decode(compressed))
    // hostile strf dims whose stride·rows product wraps Long negative
    val wrapDims = good.clone()
    java.nio.ByteBuffer.wrap(wrapDims).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(176, Int.MaxValue).putInt(180, Int.MaxValue) // biWidth, biHeight
    val exw = intercept[IllegalArgumentException](AviCodec.decode(wrapDims))
    assert(exw.getMessage.contains("exceed"), exw.getMessage)
    // hostile chunk size near Int.Max: `pos + 8 + size` wraps an Int
    // guard negative and re-enters the walk at a negative cursor — the
    // Long guard must reject it as an overrun instead
    val hugeChunk = good.clone()
    java.nio.ByteBuffer.wrap(hugeChunk).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(16, 0x7FFFFFF0) // hdrl LIST declared size
    val exh = intercept[IllegalArgumentException](AviCodec.decode(hugeChunk))
    assert(exh.getMessage.contains("overruns"), exh.getMessage)
    // undersized '00db' chunk: must throw, never decode whatever bytes
    // happen to follow the truncated chunk as pixels
    val shortFrame = good.clone()
    java.nio.ByteBuffer.wrap(shortFrame).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(228, 4) // first frame chunk's declared size (movi head at 212)
    intercept[IllegalArgumentException](AviCodec.decode(shortFrame))
  }

  test("AVI: hostile deeply-nested LISTs fail with IllegalArgumentException, " +
      "not StackOverflowError (iterative walker)") {
    // 400k minimal nested LISTs: a recursive walker would recurse that
    // deep and throw java.lang.StackOverflowError — an Error that escapes
    // the IllegalArgumentException quarantine contract call sites catch
    val depth = 400000
    val buf = java.nio.ByteBuffer.allocate(12 + 12 * depth)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + 12 * depth)
      .put("AVI ".getBytes("US-ASCII"))
    (0 until depth).foreach { i =>
      buf.put("LIST".getBytes("US-ASCII")).putInt(4 + 12 * (depth - 1 - i))
        .put("xxxx".getBytes("US-ASCII"))
    }
    val ex = intercept[IllegalArgumentException](AviCodec.decode(buf.array()))
    assert(ex.getMessage.contains("vids"), ex.getMessage)
  }

  test("AVI: an audio stream's strf (WAVEFORMATEX) must not clobber the " +
      "video dims — only the 'vids' stream's strf is honored") {
    val frames = aviFrames(2, 5, 3, seed = 7)
    val canonical = AviCodec.encode(frames, 5, 3, usPerFrame = 200000)
    // splice an auds strl AFTER hdrl: its WAVEFORMATEX strf puts
    // wBitsPerSample=24 on the bpp offset and cbSize=0 on the compression
    // offset — a last-writer-wins parse would pass both gates and decode
    // with width=nSamplesPerSec (garbage)
    val auds = java.nio.ByteBuffer.allocate(8 + 94)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    auds.put("LIST".getBytes("US-ASCII")).putInt(94).put("strl".getBytes("US-ASCII"))
    auds.put("strh".getBytes("US-ASCII")).putInt(56)
      .put("auds".getBytes("US-ASCII")).put(new Array[Byte](52))
    auds.put("strf".getBytes("US-ASCII")).putInt(18)
      .putShort(1).putShort(1)       // wFormatTag, nChannels
      .putInt(8000).putInt(16000)    // nSamplesPerSec, nAvgBytesPerSec
      .putShort(2).putShort(24)      // nBlockAlign, wBitsPerSample = 24!
      .putShort(0)                   // cbSize = 0 (lands on 'compression')
    val headEnd = 12 + 200 // RIFF header + hdrl LIST
    val spliced = canonical.take(headEnd) ++ auds.array() ++ canonical.drop(headEnd)
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val back = AviCodec.decode(spliced)
    assert(back.width == 5 && back.height == 3, s"dims clobbered: ${back.width}x${back.height}")
    (0 until 2).foreach(f => assert(back.frames(f).toSeq == frames(f).toSeq))
  }

  test("AVI: a second vids stream is rejected (single-video contract)") {
    val canonical = AviCodec.encode(aviFrames(1, 4, 3, seed = 9), 4, 3,
      usPerFrame = 200000)
    // splice a second vids strl (strh 'vids' + a well-formed 40-byte strf)
    val vids2 = java.nio.ByteBuffer.allocate(8 + 116)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vids2.put("LIST".getBytes("US-ASCII")).putInt(116).put("strl".getBytes("US-ASCII"))
    vids2.put("strh".getBytes("US-ASCII")).putInt(56)
      .put("vids".getBytes("US-ASCII")).put(new Array[Byte](52))
    vids2.put("strf".getBytes("US-ASCII")).putInt(40)
      .putInt(40).putInt(4).putInt(3).putShort(1).putShort(24)
      .putInt(0).putInt(48).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val headEnd = 12 + 200
    val spliced = canonical.take(headEnd) ++ vids2.array() ++ canonical.drop(headEnd)
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val ex = intercept[IllegalArgumentException](AviCodec.decode(spliced))
    assert(ex.getMessage.contains("multiple vids"), ex.getMessage)
  }

  test("AVI: encode sizes computed in Long — byte rate no longer wraps for " +
      "frames over 2147 bytes") {
    val (w, h) = (30, 24) // frameBytes = 92*24 = 2208 > 2147: Int form wrapped
    val frames = aviFrames(2, w, h, seed = 3)
    val bytes = AviCodec.encode(frames, w, h, usPerFrame = 200000)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // avih dwMaxBytesPerSec at offset 36 = frameBytes * 1e6 / usPerFrame
    assert(buf.getInt(36) == 2208L * 1000000L / 200000L,
      s"byte rate wrapped: ${buf.getInt(36)}")
    val back = AviCodec.decode(bytes)
    assert(back.frames.length == 2 && back.frames(0).toSeq == frames(0).toSeq)
  }

  test("syntheticAvi: analytic frame formulas match the decoded container") {
    val id = 17L
    val avi = AviCodec.decode(MediaCodecs.syntheticAvi(id))
    val (w, h, nF) = (4 + (id % 11).toInt, 3 + (id % 5).toInt, 2 + (id % 9).toInt)
    assert(avi.width == w && avi.height == h && avi.frames.length == nF)
    assert(avi.usPerFrame == 200000)
    for (f <- 0 until nF; idx <- 0 until w * h) {
      val x = idx % w; val y = idx / w
      val expect = ((((id + 7 * x + 13 * y + 17 * f) % 256) << 16) |
        (((3 * id + 5 * x + y + 29 * f) % 256) << 8) |
        ((11 * id + x + 2 * y + 23 * f) % 256)).toInt
      assert(avi.frames(f)(idx) == expect, s"frame $f pixel ($x,$y)")
    }
  }

  // ------------------------------------------------- the decoder seam

  test("CodecDecoder derives features from DECODED content for all three types") {
    val wavRow = MultimodalOps.MediaRow(10L, "audio",
      MediaCodecs.syntheticWav(10L), None, None, Some(1000L))
    val wf = MultimodalOps.CodecDecoder.decode(wavRow)
    val wav = WavCodec.decode(wavRow.content)
    assert(wf.feature(0) == wav.samples.length.toFloat)
    assert(wf.feature(1) == 8000f && wf.feature(2) == 1f)
    assert(wf.byte_len == wavRow.content.length.toLong)

    val bmpRow = MultimodalOps.MediaRow(9L, "image",
      MediaCodecs.syntheticBmp(9L), Some(640), Some(480), None)
    val bf = MultimodalOps.CodecDecoder.decode(bmpRow)
    val bmp = BmpCodec.decode(bmpRow.content)
    assert(bf.feature(0) == bmp.width.toFloat && bf.feature(1) == bmp.height.toFloat)
    val sumR = bmp.pixels.map(p => (p >> 16) & 0xff).map(_.toLong).sum
    assert(bf.feature(2) == (sumR.toDouble / bmp.pixels.length).toFloat)

    // video features come from the DECODED frame stream, not byte stats
    val vidRow = MultimodalOps.MediaRow(8L, "video",
      MediaCodecs.syntheticAvi(8L), None, None, Some(2000L))
    val cv = MultimodalOps.CodecDecoder.decode(vidRow)
    val avi = AviCodec.decode(vidRow.content)
    assert(cv.feature(0) == avi.width.toFloat && cv.feature(1) == avi.height.toFloat)
    assert(cv.feature(2) == avi.frames.length.toFloat)
    val vSumR = avi.frames.flatMap(_.map(p => ((p >> 16) & 0xff).toLong)).sum
    val denom = avi.width.toDouble * avi.height * avi.frames.length
    assert(cv.feature(3) == (vSumR / denom).toFloat)
    assert(cv.feature(6) == 200f)

    // malformed payloads and unknown media types fail loudly, not silently
    intercept[IllegalArgumentException](
      MultimodalOps.CodecDecoder.decode(wavRow.copy(content = Array[Byte](1, 2, 3))))
    intercept[IllegalArgumentException](
      MultimodalOps.CodecDecoder.decode(vidRow.copy(content = Array.tabulate(64)(_.toByte))))
    intercept[IllegalArgumentException](
      MultimodalOps.CodecDecoder.decode(vidRow.copy(media_type = "hologram")))
  }

  // -------------------------------------------------------- Resample

  test("Resample.nearest: identity at same dims; floor mapping hand-checked; " +
      "round-trips through BMP re-encode") {
    val src = pattern(4, 3, seed = 5)
    assert(MediaCodecs.Resample.nearest(src, 4, 3, 4, 3).toSeq == src.toSeq,
      "same-dims resize is the identity")
    // upscale 2x2 -> 4x4: dst (x,y) samples src (x*2/4, y*2/4) = (x/2, y/2)
    val s22 = Array(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF)
    val up = MediaCodecs.Resample.nearest(s22, 2, 2, 4, 4)
    val expect = Array(
      0xFF0000, 0xFF0000, 0x00FF00, 0x00FF00,
      0xFF0000, 0xFF0000, 0x00FF00, 0x00FF00,
      0x0000FF, 0x0000FF, 0xFFFFFF, 0xFFFFFF,
      0x0000FF, 0x0000FF, 0xFFFFFF, 0xFFFFFF)
    assert(up.toSeq == expect.toSeq)
    // downscale 4x3 -> 2x1: dst x samples src ((x*4)/2, 0) = (2x, 1)... y: (0*3)/1 = 0
    val down = MediaCodecs.Resample.nearest(src, 4, 3, 2, 1)
    assert(down.toSeq == Seq(src(0), src(2)))
    // resized pixels survive a BMP encode/decode round-trip
    val bytes = BmpCodec.encode(up, 4, 4)
    assert(BmpCodec.decode(bytes).pixels.toSeq == up.toSeq)
  }

  test("Resample.nearestAudio: identity at same rate; index mapping " +
      "hand-checked; stereo frames move together (no channel swap)") {
    val mono = Array.tabulate(10)(i => (i * 100).toShort)
    assert(MediaCodecs.Resample.nearestAudio(mono, 8000, 8000).toSeq == mono.toSeq)
    // 8k -> 3k over 8 samples: dstN = 3, dst(i) = src((i*8000)//3000) = src(0,2,5)
    val down = MediaCodecs.Resample.nearestAudio(mono.take(8), 8000, 3000)
    assert(down.toSeq == Seq[Short](0, 200, 500), s"got ${down.toSeq}")
    // upsample 3k -> 8k over 3 samples: dstN = 8, src idx = (i*3000)//8000
    val up = MediaCodecs.Resample.nearestAudio(Array[Short](1, 2, 3), 3000, 8000)
    assert(up.toSeq == Seq[Short](1, 1, 1, 2, 2, 2, 3, 3), s"got ${up.toSeq}")
    // stereo: interleaved L/R pairs stay paired under the frame mapping
    val stereo = Array[Short](10, -10, 20, -20, 30, -30, 40, -40) // 4 frames
    val st = MediaCodecs.Resample.nearestAudio(stereo, 8000, 4000, channels = 2)
    assert(st.toSeq == Seq[Short](10, -10, 30, -30), s"channel swap: ${st.toSeq}")
    intercept[IllegalArgumentException](
      MediaCodecs.Resample.nearestAudio(Array[Short](1, 2, 3), 8000, 4000, 2))
  }

  test("Resample.bilinear: identity at same dims; exact-integer midpoint " +
      "hand-checked; corners map to corners (align-corners)") {
    val src = pattern(5, 4, seed = 9)
    assert(MediaCodecs.Resample.bilinear(src, 5, 4, 5, 4).toSeq == src.toSeq,
      "same-dims bilinear is the identity (align-corners, integer positions)")
    // 2x1 -> 3x1: middle pixel is the exact half-up average per channel
    val s = Array(0x00000A, 0x000014) // blue 10 and 20
    val out = MediaCodecs.Resample.bilinear(s, 2, 1, 3, 1)
    assert(out(0) == 0x00000A && out(2) == 0x000014, "corners map to corners")
    assert(out(1) == 0x00000F, s"midpoint must be 15: ${out(1)}")
    // half-up rounding: average of 10 and 15 is 12.5 -> 13
    val s2 = Array(0x00000A, 0x00000F)
    assert(MediaCodecs.Resample.bilinear(s2, 2, 1, 3, 1)(1) == 0x00000D)
    // 2x2 -> 3x3 center: average of all four corners, per channel
    val q = Array(0x0A0000, 0x1E0000, 0x280000, 0x500000) // red 10,30,40,80
    val c = MediaCodecs.Resample.bilinear(q, 2, 2, 3, 3)(4)
    assert(((c >> 16) & 0xff) == 40, s"center red must be (10+30+40+80)/4: ${(c >> 16) & 0xff}")
    // degenerate 1-wide axis: no NaN/zero-division, output well-formed
    val one = MediaCodecs.Resample.bilinear(Array(0x123456), 1, 1, 3, 2)
    assert(one.toSeq == Seq.fill(6)(0x123456))
  }
}
