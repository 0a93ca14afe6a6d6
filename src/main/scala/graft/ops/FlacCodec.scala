package graft.ops

/** Pure-JVM FLAC codec (RFC 9639 / the published FLAC format): byte-level
  * encode + decode with no library dependency — the compressed-audio
  * member of the [[MediaCodecs]] family (WAV/BMP/AVI are already
  * containers the JVM round-trips; real crawled audio is FLAC, which
  * until now sat behind the "needs a native library" fence).
  *
  * Scope — the integer-exact subset every FLAC stream must support:
  *
  *  - STREAMINFO metadata block (the mandatory first block; others are
  *    skipped on decode per their length fields);
  *  - fixed-blocking frames, all published block-size / sample-rate /
  *    sample-size codes on decode;
  *  - CONSTANT, VERBATIM, FIXED (orders 0–4) and LPC subframes with
  *    Rice-coded residuals (4- and 5-bit parameter variants, raw-bits
  *    escape, any partition order) and wasted-bits shifts on decode;
  *    the encoder's LPC analysis is real (windowless autocorrelation →
  *    Levinson–Durbin → 12-bit quantized coefficients, residuals
  *    recomputed over the QUANTIZED integer predictor so coded sizes
  *    are exact);
  *  - all four published channel assignments: independent channels
  *    (mono/stereo/...) and the three stereo decorrelations
  *    (left/side, right/side, mid/side — side at bps+1 bits), chosen
  *    on encode by exact coded size per frame;
  *  - every integrity field the format carries: frame-header CRC-8,
  *    whole-frame CRC-16, and the STREAMINFO MD5 of the decoded PCM
  *    stream — a single flipped bit anywhere fails the decode.
  *
  * The encoder is a real (small) FLAC encoder, not a fixture writer: per
  * block it tries CONSTANT (all-equal), FIXED orders 0–4 (exact Rice
  * cost under the best 4-bit parameter, raw-bits escape included) and
  * VERBATIM, and emits the cheapest — so crafted inputs exercise every
  * subframe shape and pseudo-random input still compresses when a fixed
  * predictor wins. Correctness is pinned by round-trip identity +
  * subframe-shape assertions in `FlacCodecSpec` and by the m13 battery
  * row, whose DuckDB oracle recomputes the decoded sample statistics of
  * a closed-form corpus (constant run → ramp → hash noise per asset, so
  * all three subframe families appear in every asset).
  *
  * Like the other codecs this backs the engine-side contract the
  * reference draws at its file-blob boundary
  * (drs_document_reference.py:224-243 — opaque bytes in, typed
  * rows/metadata out); decode is integer byte/bit walking, safe and
  * allocation-light inside an executor task.
  */
object FlacCodec {

  /** Decoded PCM16 audio (interleaved when multi-channel) plus the
    * subframe-type census the spec asserts coverage with:
    * (constant, verbatim, fixedByOrder(0..4)) counts and the number of
    * frames that used a stereo-decorrelation channel assignment
    * (left/side, right/side or mid/side).
    */
  final case class FlacData(sampleRate: Int, channels: Int,
      samples: Array[Short], nConstant: Int, nVerbatim: Int,
      nFixed: Array[Int], nDecorrelated: Int, nLpc: Int)

  // ------------------------------------------------------------ bit io

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def write(v: Long, bits: Int): Unit = {
      require(bits >= 0 && bits <= 56, s"bits out of range: $bits")
      if (bits == 0) return
      acc = (acc << bits) | (v & ((1L << bits) - 1))
      n += bits
      while (n >= 8) {
        out.write(((acc >>> (n - 8)) & 0xff).toInt)
        n -= 8
      }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { write(0, 1); i += 1 }
      write(1, 1)
    }
    def align(): Unit = if (n != 0) write(0, 8 - n)
    def toBytes: Array[Byte] = { align(); out.toByteArray }
  }

  private final class BitReader(bytes: Array[Byte]) {
    var bitPos: Int = 0
    def remainingBits: Int = bytes.length * 8 - bitPos
    def readBits(bits: Int): Long = {
      require(bits >= 0 && bits <= 56, s"bits out of range: $bits")
      require(remainingBits >= bits, "FLAC bitstream truncated")
      var v = 0L
      var left = bits
      while (left > 0) {
        val byteIdx = bitPos >>> 3
        val bitOff = bitPos & 7
        val take = math.min(8 - bitOff, left)
        val chunk = (bytes(byteIdx) >> (8 - bitOff - take)) &
          ((1 << take) - 1)
        v = (v << take) | (chunk & 0xff)
        bitPos += take
        left -= take
      }
      v
    }
    def readSigned(bits: Int): Int = {
      val u = readBits(bits)
      ((u << (64 - bits)).toLong >> (64 - bits)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBits(1) == 0L) {
        q += 1
        require(q <= remainingBits + 1, "unary run overruns the stream")
      }
      q
    }
    def align(): Unit = if ((bitPos & 7) != 0) bitPos += 8 - (bitPos & 7)
    def bytePos: Int = { require((bitPos & 7) == 0); bitPos >>> 3 }
  }

  // -------------------------------------------------------------- crcs

  /** CRC-8, polynomial x⁸+x²+x+1 (0x07), init 0 — the frame-header crc. */
  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x¹⁶+x¹⁵+x²+1 (0x8005), init 0 — the frame crc. */
  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // --------------------------------------------------- fixed predictors

  /** residual(n) = s(n) − fixedPredict(order, history) — the five
    * published fixed polynomial predictors.
    */
  private def fixedPredict(order: Int, s: Array[Int], n: Int): Int =
    order match {
      case 0 => 0
      case 1 => s(n - 1)
      case 2 => 2 * s(n - 1) - s(n - 2)
      case 3 => 3 * s(n - 1) - 3 * s(n - 2) + s(n - 3)
      case 4 => 4 * s(n - 1) - 6 * s(n - 2) + 4 * s(n - 3) - s(n - 4)
    }

  private def zigzag(e: Int): Long = ((e.toLong << 1) ^ (e.toLong >> 63))

  private def unzigzag(u: Long): Int = ((u >>> 1) ^ -(u & 1L)).toInt

  /** Exact bit cost of one Rice partition at parameter p. */
  private def riceCost(res: Array[Int], p: Int): Long = {
    var bits = 0L
    var i = 0
    while (i < res.length) {
      bits += (zigzag(res(i)) >>> p) + 1 + p
      i += 1
    }
    bits
  }

  /** Best 4-bit Rice parameter (0–14) and its cost; 15 is the escape. */
  private def bestRice(res: Array[Int]): (Int, Long) = {
    var bestP = 0
    var bestBits = Long.MaxValue
    var p = 0
    while (p <= 14) {
      val c = riceCost(res, p)
      if (c < bestBits) { bestBits = c; bestP = p }
      p += 1
    }
    (bestP, bestBits)
  }

  // ------------------------------------------------------------ encode

  private def writeUtf8Number(w: BitWriter, n: Long): Unit = {
    if (n < 0x80) w.write(n, 8)
    else {
      // count of payload bytes after the lead byte
      val extra =
        if (n < 0x800) 1 else if (n < 0x10000) 2 else if (n < 0x200000) 3
        else if (n < 0x4000000) 4 else 5
      val lead = (0xfe << (6 - extra)) & 0xff
      w.write(lead | (n >>> (6 * extra)).toInt, 8)
      var i = extra - 1
      while (i >= 0) {
        w.write(0x80L | ((n >>> (6 * i)) & 0x3f), 8)
        i -= 1
      }
    }
  }

  /** Encode PCM16 (interleaved when `channels` = 2) as a FLAC stream:
    * STREAMINFO + fixed-blocking frames of `blockSize` inter-channel
    * samples (the last may be shorter). Each subframe is the cheapest
    * of CONSTANT / FIXED 0–4 / VERBATIM; stereo frames additionally
    * pick the cheapest of the four published channel assignments
    * (independent, left/side, right/side, mid/side) by exact coded
    * size — the decorrelation real encoders use, with the side channel
    * at bps+1 bits per the format.
    */
  def encode(samples: Array[Short], sampleRate: Int,
      blockSize: Int = 4096, channels: Int = 1): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), "invalid sample rate")
    require(blockSize >= 16 && blockSize <= 65535, "blockSize out of range")
    require(channels == 1 || channels == 2, "1 or 2 channels")
    require(samples.nonEmpty && samples.length % channels == 0,
      "sample count must be a positive multiple of the channel count")
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')

    val total = samples.length / channels // inter-channel samples
    val nFrames = (total + blockSize - 1) / blockSize

    // MD5 of the unencoded stream: 16-bit little-endian, interleaved
    val md = java.security.MessageDigest.getInstance("MD5")
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val md5 = md.digest(pcm)

    val si = new BitWriter
    si.write(1, 1) // last metadata block
    si.write(0, 7) // STREAMINFO
    si.write(34, 24) // length
    // min == max == blockSize: the format EXCLUDES the (possibly
    // shorter) last block from the minimum, and values < 16 are invalid
    // — writing the last block's length here would make every stream
    // whose total is not a blockSize multiple spec-violating
    si.write(blockSize, 16)
    si.write(blockSize, 16)
    si.write(0, 24) // min frame size unknown
    si.write(0, 24) // max frame size unknown
    si.write(sampleRate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5) // bits per sample - 1
    si.write(total.toLong, 36)
    md5.foreach(b => si.write(b & 0xffL, 8))
    out.write(si.toBytes)

    var frame = 0
    while (frame < nFrames) {
      val off = frame * blockSize
      val len = math.min(blockSize, total - off)
      val chans = Array.ofDim[Int](channels, len)
      var j = 0
      while (j < len) {
        var c = 0
        while (c < channels) {
          chans(c)(j) = samples((off + j) * channels + c).toInt
          c += 1
        }
        j += 1
      }
      out.write(encodeFrame(chans, frame))
      frame += 1
    }
    out.toByteArray
  }

  /** The channel assignment + subframe plans of one frame, chosen by
    * exact total coded size: mono is always independent; stereo
    * compares independent / left-side / right-side / mid-side
    * (mid = (L+R)>>1, side = L−R at bps+1 — the published lossless
    * decorrelation trio).
    */
  private def planFrame(chans: Array[Array[Int]]): (Int, Seq[SubPlan]) =
    if (chans.length == 1) (0, Seq(planSubframe(chans(0), 16)))
    else {
      val (l, r) = (chans(0), chans(1))
      val n = l.length
      val side = new Array[Int](n)
      val mid = new Array[Int](n)
      var i = 0
      while (i < n) {
        side(i) = l(i) - r(i)
        mid(i) = (l(i) + r(i)) >> 1
        i += 1
      }
      val pl = planSubframe(l, 16)
      val pr = planSubframe(r, 16)
      val ps = planSubframe(side, 17)
      val pm = planSubframe(mid, 16)
      val options = Seq(
        (1, Seq(pl, pr)), // independent stereo
        (8, Seq(pl, ps)), // left/side
        (9, Seq(ps, pr)), // right/side
        (10, Seq(pm, ps))) // mid/side
      options.minBy { case (_, plans) => plans.map(_.bits).sum }
    }

  private def encodeFrame(chans: Array[Array[Int]], frameNo: Int): Array[Byte] = {
    val (chanCode, plans) = planFrame(chans)
    val header = new BitWriter
    header.write(0x3ffe, 14) // sync
    header.write(0, 1) // reserved
    header.write(0, 1) // fixed blocking
    header.write(7, 4) // block size: 16 bits at end of header
    header.write(0, 4) // sample rate: from STREAMINFO
    header.write(chanCode, 4)
    header.write(4, 3) // sample size: 16 bits
    header.write(0, 1) // reserved
    writeUtf8Number(header, frameNo.toLong)
    header.write(chans(0).length - 1, 16)
    val headerBytes = header.toBytes

    val w = new BitWriter
    headerBytes.foreach(b => w.write(b & 0xffL, 8))
    w.write(crc8(headerBytes, 0, headerBytes.length), 8)
    plans.foreach(p => writeSubframe(w, p))
    // the frame writer is byte-built so the CRC-16 can cover it
    val body = w.toBytes
    val full = new BitWriter
    body.foreach(b => full.write(b & 0xffL, 8))
    full.write(crc16(body, 0, body.length), 16)
    full.toBytes
  }

  /** One planned subframe: type, predictor order, Rice parameter (15 =
    * raw escape at `maxRaw` bits), residuals, exact coded size
    * INCLUDING the 8-bit subframe header (so plan sizes compare across
    * channel assignments), the samples and their coded width.
    */
  private final case class SubPlan(tpe: Int, order: Int, p: Int,
      maxRaw: Int, res: Array[Int], bits: Long, block: Array[Int],
      sampleBits: Int, coefs: Array[Int] = null, shift: Int = 0,
      precision: Int = 0)

  private def rawWidth(res: Array[Int]): Int = {
    var maxBits = 1
    var i = 0
    while (i < res.length) {
      val need = (64 - java.lang.Long.numberOfLeadingZeros(
        math.abs(res(i).toLong).max(1)) + 1).toInt
      if (need > maxBits) maxBits = need
      i += 1
    }
    maxBits
  }

  /** Min-cost plan among CONSTANT / FIXED 0–4 / LPC / VERBATIM; FIXED
    * and LPC residuals Rice-coded at partition order 0 with the exact
    * best parameter (raw-bits escape when cheaper).
    */
  private def planSubframe(block: Array[Int], sampleBits: Int): SubPlan = {
    val n = block.length
    if (block.forall(_ == block(0)))
      return SubPlan(0, 0, 0, 0, null, 8L + sampleBits, block, sampleBits)

    var best = SubPlan(1, 0, 0, 0, null, 8L + sampleBits.toLong * n,
      block, sampleBits) // VERBATIM fallback
    var order = 0
    while (order <= 4 && order < n) {
      val res = new Array[Int](n - order)
      var k = order
      while (k < n) { res(k - order) = block(k) - fixedPredict(order, block, k); k += 1 }
      val (p, riceBits) = bestRice(res)
      val maxRaw = rawWidth(res)
      // the escape's 5-bit width field caps the residual width at 31;
      // wider residuals (possible near Int range) must stay Rice-coded
      // or lose to VERBATIM — an unguarded width would truncate mod 32
      // and emit an undecodable stream
      val escBits =
        if (maxRaw <= 31) maxRaw.toLong * res.length + 5 else Long.MaxValue
      val useEscape = escBits < riceBits
      val total = 8L + sampleBits.toLong * order + 2 + 4 + 4 +
        math.min(riceBits, escBits)
      if (total < best.bits)
        best = SubPlan(8 + order, order, if (useEscape) 15 else p,
          maxRaw, res, total, block, sampleBits)
      order += 1
    }
    lpcPlan(block, sampleBits, maxOrder = 8).foreach { lp =>
      if (lp.bits < best.bits) best = lp
    }
    best
  }

  /** LPC analysis: windowless autocorrelation → Levinson–Durbin →
    * coefficients quantized to `LpcPrecision` bits under the largest
    * shift (≤ 15) that fits — the integer predictor the format stores,
    * re-run here over the quantized coefficients so the residuals (and
    * the coded size) are exact, not estimated. None when the block is
    * too short, degenerate, or the recursion goes unstable — the
    * FIXED/VERBATIM plans stand.
    */
  private val LpcPrecision = 12

  private def lpcPlan(block: Array[Int], sampleBits: Int,
      maxOrder: Int): Option[SubPlan] = {
    val n = block.length
    if (n < maxOrder * 2) return None
    val ac = new Array[Double](maxOrder + 1)
    var lag = 0
    while (lag <= maxOrder) {
      var s = 0.0
      var i = lag
      while (i < n) { s += block(i).toDouble * block(i - lag); i += 1 }
      ac(lag) = s
      lag += 1
    }
    if (ac(0) <= 0.0) return None
    // Levinson–Durbin, snapshotting each intermediate order: the header
    // costs 16+4+5 + order·(sampleBits+precision) bits, so a low order
    // with slightly worse residuals often beats order-max — plan every
    // order and keep the cheapest, like the reference encoders' search
    val lpc = new Array[Double](maxOrder + 1)
    val byOrder = new Array[Array[Double]](maxOrder + 1)
    var err = ac(0)
    var m = 0
    while (m < maxOrder && err > 0) {
      var racc = ac(m + 1)
      var j = 0
      while (j < m) { racc -= lpc(j) * ac(m - j); j += 1 }
      val k = racc / err
      val prev = java.util.Arrays.copyOf(lpc, m)
      var i = 0
      while (i < m) { lpc(i) = prev(i) - k * prev(m - 1 - i); i += 1 }
      lpc(m) = k
      err *= 1 - k * k
      m += 1
      byOrder(m) = java.util.Arrays.copyOf(lpc, m)
    }
    if (m == 0) return None
    (1 to m).flatMap(o => lpcPlanAt(block, sampleBits, byOrder(o)))
      .sortBy(_.bits).headOption
  }

  private def lpcPlanAt(block: Array[Int], sampleBits: Int,
      lpc: Array[Double]): Option[SubPlan] = {
    val n = block.length
    val order = lpc.length
    // quantize under the biggest shift whose coefficients fit
    val bound = 1 << (LpcPrecision - 1)
    var shift = 15
    def quantized(s: Int): Option[Array[Int]] = {
      val q = new Array[Int](order)
      var i = 0
      while (i < order) {
        val c = math.round(lpc(i) * (1L << s)).toDouble
        if (c >= bound || c < -bound || c.isNaN) return None
        q(i) = c.toInt
        i += 1
      }
      Some(q)
    }
    var qc: Option[Array[Int]] = None
    while (shift >= 0 && { qc = quantized(shift); qc.isEmpty }) shift -= 1
    qc.flatMap { coefs =>
      val res = new Array[Int](n - order)
      var i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * block(i - 1 - j); j += 1 }
        val e = block(i).toLong - (acc >> shift)
        // a degenerate quantization can predict wildly; a residual that
        // does not fit an Int cannot be coded — let FIXED/VERBATIM stand
        if (e > Int.MaxValue || e < Int.MinValue) return None
        res(i - order) = e.toInt
        i += 1
      }
      val (p, riceBits) = bestRice(res)
      val maxRaw = rawWidth(res)
      // same 31-bit escape-width cap as the FIXED planner (see there)
      val escBits =
        if (maxRaw <= 31) maxRaw.toLong * res.length + 5 else Long.MaxValue
      val useEscape = escBits < riceBits
      val total = 8L + sampleBits.toLong * order + 4 + 5 +
        LpcPrecision.toLong * order + 2 + 4 + 4 + math.min(riceBits, escBits)
      Some(SubPlan(31 + order, order, if (useEscape) 15 else p, maxRaw, res,
        total, block, sampleBits, coefs, shift, LpcPrecision))
    }
  }

  private def writeSubframe(w: BitWriter, plan: SubPlan): Unit = {
    val block = plan.block
    val n = block.length
    w.write(0, 1); w.write(plan.tpe, 6); w.write(0, 1) // no wasted bits
    plan.tpe match {
      case 0 => w.write(block(0).toLong, plan.sampleBits)
      case 1 =>
        var k = 0
        while (k < n) { w.write(block(k).toLong, plan.sampleBits); k += 1 }
      case _ =>
        var k = 0
        while (k < plan.order) { w.write(block(k).toLong, plan.sampleBits); k += 1 }
        if (plan.tpe >= 32) { // LPC header: precision, shift, coefficients
          w.write(plan.precision - 1, 4)
          w.write(plan.shift, 5)
          var c = 0
          while (c < plan.order) {
            w.write(plan.coefs(c).toLong, plan.precision); c += 1
          }
        }
        w.write(0, 2) // residual method: RICE (4-bit params)
        w.write(0, 4) // partition order 0
        if (plan.p == 15) {
          // enforced at plan time; a 5-bit field silently truncates
          // wider values into an undecodable stream
          require(plan.maxRaw <= 31,
            s"raw-bits escape width ${plan.maxRaw} exceeds the 5-bit field")
          w.write(15, 4)
          w.write(plan.maxRaw, 5)
          var k3 = 0
          while (k3 < plan.res.length) {
            w.write(plan.res(k3).toLong, plan.maxRaw); k3 += 1
          }
        } else {
          w.write(plan.p, 4)
          var k3 = 0
          while (k3 < plan.res.length) {
            val u = zigzag(plan.res(k3))
            w.writeUnary((u >>> plan.p).toInt)
            w.write(u, plan.p)
            k3 += 1
          }
        }
    }
  }

  // ------------------------------------------------------------ decode

  private def readUtf8Number(r: BitReader): Long = {
    val lead = r.readBits(8).toInt
    if ((lead & 0x80) == 0) lead.toLong
    else {
      var extra = 0
      var mask = 0x40
      while ((lead & mask) != 0) { extra += 1; mask >>= 1 }
      require(extra >= 1 && extra <= 6, s"bad coded-number lead byte: $lead")
      var v = (lead & (0x3f >> extra)).toLong
      var i = 0
      while (i < extra) {
        val c = r.readBits(8).toInt
        require((c & 0xc0) == 0x80, "bad coded-number continuation byte")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  /** Parse a FLAC stream (see object doc for the supported subset).
    * Every integrity field is enforced: header CRC-8, frame CRC-16,
    * stream MD5 (when STREAMINFO carries one).
    */
  def decode(bytes: Array[Byte]): FlacData = {
    require(bytes.length > 42, s"FLAC too short: ${bytes.length} bytes")
    require(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
      bytes(3) == 'C', "not a FLAC stream (bad magic)")
    val r = new BitReader(bytes)
    r.bitPos = 32

    // metadata blocks: STREAMINFO must come first; skip the rest
    var last = false
    var first = true
    var streamSampleRate = -1
    var channels = -1
    var bps = -1
    var totalSamples = -1L
    var md5: Array[Byte] = null
    while (!last) {
      last = r.readBits(1) == 1
      val btype = r.readBits(7).toInt
      val blen = r.readBits(24).toInt
      if (first) {
        require(btype == 0, s"first metadata block must be STREAMINFO, got $btype")
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        streamSampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
        md5 = Array.fill(16)(0.toByte)
        var i = 0
        while (i < 16) { md5(i) = r.readBits(8).toByte; i += 1 }
        require(bps <= 16, s"only <=16-bit streams decode to Short, got $bps")
        first = false
      } else {
        require(btype != 0 && btype <= 126, s"invalid metadata block type $btype")
        r.bitPos += blen * 8
      }
    }
    require(!first, "no STREAMINFO block")

    val out = new java.io.ByteArrayOutputStream() // PCM16 LE for the md5
    val samples = scala.collection.mutable.ArrayBuilder.make[Short]
    var nConstant = 0
    var nVerbatim = 0
    val nFixed = new Array[Int](5)
    var nDecorrelated = 0
    var nLpc = 0
    var decoded = 0L

    while (decoded < totalSamples) {
      val frameStart = r.bytePos
      require(r.readBits(14) == 0x3ffe, s"lost frame sync at byte $frameStart")
      require(r.readBits(1) == 0, "reserved frame-header bit set")
      r.readBits(1) // blocking strategy (the coded number disambiguates)
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chanCode = r.readBits(4).toInt
      val ssCode = r.readBits(3).toInt
      require(r.readBits(1) == 0, "reserved frame-header bit set")
      readUtf8Number(r)
      val blockLen = bsCode match {
        case 0 => throw new IllegalArgumentException("reserved block-size code 0")
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 0 => ()
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => throw new IllegalArgumentException("invalid sample-rate code 15")
        case _ => () // a table rate; STREAMINFO stays authoritative
      }
      require(chanCode <= 10, s"reserved channel assignment $chanCode")
      val decorrelated = chanCode >= 8
      val frameChannels = if (decorrelated) 2 else chanCode + 1
      require(frameChannels == channels,
        s"frame channel count $frameChannels != STREAMINFO $channels")
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case c => throw new IllegalArgumentException(s"reserved sample-size code $c")
      }
      require(frameBps == bps, s"frame bps $frameBps != STREAMINFO $bps")
      val headerEnd = r.bytePos
      val expectedCrc8 = r.readBits(8).toInt
      require(crc8(bytes, frameStart, headerEnd) == expectedCrc8,
        s"frame header CRC-8 mismatch at byte $frameStart")

      val chans = Array.ofDim[Int](frameChannels, blockLen)
      var ch = 0
      while (ch < frameChannels) {
        // the side channel of a decorrelated pair carries one extra bit
        // (it holds a 17-bit difference of 16-bit samples)
        val chBits = chanCode match {
          case 8 | 10 => if (ch == 1) bps + 1 else bps
          case 9 => if (ch == 0) bps + 1 else bps
          case _ => bps
        }
        readSubframe(r, chans(ch), chBits) match {
          case 0 => nConstant += 1
          case 1 => nVerbatim += 1
          case o if o >= 32 => nLpc += 1
          case o => nFixed(o - 8) += 1
        }
        ch += 1
      }
      if (decorrelated) {
        nDecorrelated += 1
        var j = 0
        while (j < blockLen) {
          chanCode match {
            case 8 => // left/side: R = L − side
              chans(1)(j) = chans(0)(j) - chans(1)(j)
            case 9 => // right/side: L = R + side
              val s = chans(0)(j)
              chans(0)(j) = chans(1)(j) + s
            case 10 => // mid/side: recover the dropped low bit from side
              val side = chans(1)(j)
              val m2 = (chans(0)(j) << 1) | (side & 1)
              chans(0)(j) = (m2 + side) >> 1
              chans(1)(j) = (m2 - side) >> 1
          }
          j += 1
        }
      }
      r.align()
      val frameEnd = r.bytePos
      val expectedCrc16 = r.readBits(16).toInt
      require(crc16(bytes, frameStart, frameEnd) == expectedCrc16,
        s"frame CRC-16 mismatch at byte $frameStart")

      var j = 0
      while (j < blockLen && decoded < totalSamples) {
        var c = 0
        while (c < frameChannels) {
          val v = chans(c)(j)
          require(v >= Short.MinValue && v <= Short.MaxValue,
            s"decoded sample $v overflows 16 bits")
          samples += v.toShort
          out.write(v & 0xff)
          out.write((v >> 8) & 0xff)
          c += 1
        }
        decoded += 1
        j += 1
      }
    }

    if (md5.exists(_ != 0)) {
      val got = java.security.MessageDigest.getInstance("MD5")
        .digest(out.toByteArray)
      require(java.util.Arrays.equals(got, md5),
        "decoded stream MD5 does not match STREAMINFO")
    }
    FlacData(streamSampleRate, channels, samples.result(),
      nConstant, nVerbatim, nFixed, nDecorrelated, nLpc)
  }

  /** Decode one subframe into `dest`; returns the 6-bit subframe type
    * code (0 constant, 1 verbatim, 8+order fixed).
    */
  private def readSubframe(r: BitReader, dest: Array[Int], bps: Int): Int = {
    require(r.readBits(1) == 0, "subframe padding bit set")
    val t = r.readBits(6).toInt
    val wastedFlag = r.readBits(1)
    val wasted = if (wastedFlag == 1) r.readUnary() + 1 else 0
    val eff = bps - wasted
    require(eff > 0, s"wasted bits $wasted exhaust the sample size")
    val n = dest.length
    t match {
      case 0 =>
        val v = r.readSigned(eff) << wasted
        java.util.Arrays.fill(dest, v)
      case 1 =>
        var i = 0
        while (i < n) { dest(i) = r.readSigned(eff) << wasted; i += 1 }
      case ft if ft >= 8 && ft <= 12 =>
        val order = ft - 8
        require(order <= n, s"fixed order $order exceeds block of $n")
        var i = 0
        while (i < order) { dest(i) = r.readSigned(eff); i += 1 }
        readResiduals(r, dest, order)
        i = order
        while (i < n) { dest(i) += fixedPredict(order, dest, i); i += 1 }
        if (wasted > 0) { i = 0; while (i < n) { dest(i) <<= wasted; i += 1 } }
      case lpc if lpc >= 32 =>
        val order = lpc - 31
        require(order <= n, s"LPC order $order exceeds block of $n")
        var i = 0
        while (i < order) { dest(i) = r.readSigned(eff); i += 1 }
        val precision = r.readBits(4).toInt + 1
        require(precision <= 15, "invalid LPC coefficient precision 16")
        val shift = r.readSigned(5)
        require(shift >= 0, s"negative LPC shift $shift is reserved")
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
        readResiduals(r, dest, order)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * dest(i - 1 - j); j += 1 }
          dest(i) += (acc >> shift).toInt
          i += 1
        }
        if (wasted > 0) { i = 0; while (i < n) { dest(i) <<= wasted; i += 1 } }
      case other =>
        throw new IllegalArgumentException(s"reserved subframe type $other")
    }
    t
  }

  /** Rice-coded residuals into dest(order until n) — both parameter
    * widths, any partition order, raw-bits escape.
    */
  private def readResiduals(r: BitReader, dest: Array[Int], order: Int): Unit = {
    val n = dest.length
    val method = r.readBits(2).toInt
    require(method <= 1, s"reserved residual coding method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readBits(4).toInt
    val parts = 1 << partOrder
    require(n % parts == 0, s"block $n not divisible into $parts partitions")
    val perPart = n / parts
    require(perPart > order || partOrder == 0,
      "first partition under-runs the predictor order")
    var idx = order
    var part = 0
    while (part < parts) {
      val count = if (part == 0) perPart - order else perPart
      val p = r.readBits(paramBits).toInt
      if (p == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) {
          dest(idx) = if (raw == 0) 0 else r.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val u = (q.toLong << p) | r.readBits(p)
          dest(idx) = unzigzag(u)
          idx += 1; i += 1
        }
      }
      part += 1
    }
  }

  /** Synthetic STEREO FLAC asset for the m14 battery row: left channel
    * is multiplicative-hash noise (range-limited so right stays in 16
    * bits), right = left + a tiny dither — strongly correlated, so a
    * decorrelated channel assignment wins every frame and the oracle
    * can assert the stereo machinery actually engaged. `48 + id % 97`
    * frames at 16 kHz, every term integer-exact.
    */
  def syntheticFlacStereo(id: Long): Array[Byte] = {
    val n = (48 + id % 97).toInt
    val samples = new Array[Short](2 * n)
    var i = 0
    while (i < n) {
      val l = ((id * 7919 + i.toLong * 104729) % 60000 - 30000).toInt
      samples(2 * i) = l.toShort
      samples(2 * i + 1) = (l + i % 5 - 2).toShort
      i += 1
    }
    encode(samples, 16000, blockSize = 16, channels = 2)
  }

  /** Synthetic FLAC asset for the m13 battery row — the closed-form
    * corpus law: per asset, 16 constant samples (a CONSTANT subframe at
    * blockSize 16), then 16 linear-ramp samples with a NEVER-ZERO slope
    * (zero order-2 residuals → a FIXED subframe; a zero slope would
    * collapse the block to CONSTANT), then multiplicative-hash noise
    * (whatever coding costs least) — `64 + id % 191` samples total at
    * 8 kHz mono, every term integer-exact for the DuckDB oracle.
    */
  def syntheticFlac(id: Long): Array[Byte] = {
    val n = (64 + id % 191).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      val v =
        if (i < 16) (id * 31 % 65536 - 32768).toInt
        else if (i < 32) ((1 + id % 96) * (i - 16) + id % 1003 - 500).toInt
        else ((id * 2654435761L + i * 40503L) % 65536 - 32768).toInt
      samples(i) = v.toShort
      i += 1
    }
    encode(samples, 8000, blockSize = 16)
  }
}
