package graft.operators.multimodal

/** Pure-JVM IMA/DVI ADPCM decoder (WAVE format tag 0x0011) — round 15.
  *
  * Why it earns a built-in: IMA ADPCM is the WAV compression that
  * legacy speech corpora and telephony datasets actually ship (4 bits
  * per sample, fixed 4:1 over 16-bit PCM), and `javax.sound` does NOT
  * decode it — such payloads previously degraded to the stub path.
  * The codec is tiny and fully public (the IMA "Recommended Practices
  * for Enhancing Digital Audio Compatibility" algorithm, also specified
  * in Microsoft's WAVE format registry for tag 0x11).
  *
  * Verification (AdpcmSpec): the 89-entry step table follows a
  * geometric ~1.1008× growth law (7 → 32767 over 88 steps) — every
  * entry is pinned within 10% of the analytic curve plus strict
  * monotonicity and exact endpoints, the same transcription-falsifier
  * discipline as the CABAC engine tables; the decoder is pinned
  * BIT-EXACT against the in-repo test encoder's own reconstruction
  * trace (ADPCM encoders track the decoder state, so encode-side
  * reconstruction ≡ decode output exactly, lossy codec or not), plus
  * SNR sanity vs the original signal, stereo de-interleave, multi-block
  * streams, and corruption fuzz.
  *
  * Block layout (per the WAVE spec for tag 0x11): each `blockAlign`
  * bytes hold, per channel, a 4-byte header (initial predictor int16
  * LE — which IS the block's first output sample — then step index,
  * then a reserved byte), followed by the channels' nibble data
  * interleaved in 4-byte groups; low nibble first within each byte.
  */
object AdpcmDecoder extends AudioDecoder {

  /** IMA step-size table (89 entries, index clamped to [0, 88]). */
  val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adjustment per 3-bit magnitude (sign bit excluded). */
  val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One nibble through the IMA update: returns the new (sample,
    * index). Shared by decoder and the test encoder's reconstruction.
    */
  @inline def step(nibble: Int, pred: Int, index: Int): (Int, Int) = {
    val st = StepTable(index)
    var diff = st >> 3
    if ((nibble & 1) != 0) diff += st >> 2
    if ((nibble & 2) != 0) diff += st >> 1
    if ((nibble & 4) != 0) diff += st
    var p = if ((nibble & 8) != 0) pred - diff else pred + diff
    if (p > 32767) p = 32767
    if (p < -32768) p = -32768
    var ix = index + IndexTable(nibble & 7)
    if (ix < 0) ix = 0
    if (ix > 88) ix = 88
    (p, ix)
  }

  private def u16(d: Array[Byte], o: Int): Int =
    (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
  private def s16(d: Array[Byte], o: Int): Int = {
    val v = u16(d, o)
    if (v >= 0x8000) v - 0x10000 else v
  }
  private def u32(d: Array[Byte], o: Int): Long =
    (u16(d, o).toLong) | (u16(d, o + 2).toLong << 16)

  private def tag(d: Array[Byte], off: Int, t: String): Boolean =
    d.length >= off + t.length &&
      t.indices.forall(i => d(off + i) == t(i).toByte)

  /** RIFF/WAVE whose fmt chunk carries format tag 0x0011 — checked
    * cheaply so [[AudioDecoder.JavaSoundPcm]] (which claims all other
    * RIFF/WAVE) and this decoder stay disjoint claimants.
    */
  def supports(d: Array[Byte]): Boolean =
    tag(d, 0, "RIFF") && tag(d, 8, "WAVE") && findFmt(d).exists {
      case (off, _) => u16(d, off) == 0x0011
    }

  /** Locate (payload offset, payload size) of a chunk id.
    *
    * Total on malformed input — `supports` calls this with no try/catch
    * inside Spark task closures (BinaryPipeline routing), so one
    * truncated WAV must never throw: the cursor is a Long (a declared
    * chunk size near Int.MaxValue can't overflow it negative), and a
    * clamped payload shorter than 2 bytes is treated as absent because
    * every caller immediately reads u16 fields out of it.
    */
  private def findChunk(d: Array[Byte], id: String): Option[(Int, Int)] = {
    var o = 12L
    while (o + 8 <= d.length) {
      val oi = o.toInt
      val size = u32(d, oi + 4)
      if (size < 0 || size > Int.MaxValue) return None
      if (tag(d, oi, id)) {
        val s = math.min(size, d.length - o - 8).toInt
        return if (s >= 2) Some((oi + 8, s)) else None
      }
      o += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }
  private def findFmt(d: Array[Byte]) = findChunk(d, "fmt ")

  private[multimodal] def u16x(d: Array[Byte], o: Int): Int = u16(d, o)
  private[multimodal] def s16x(d: Array[Byte], o: Int): Int = s16(d, o)
  private[multimodal] def findChunkx(d: Array[Byte], id: String): Option[(Int, Int)] =
    findChunk(d, id)
  private[multimodal] def riffWave(d: Array[Byte]): Boolean =
    tag(d, 0, "RIFF") && tag(d, 8, "WAVE")

  /** Header-only: the same fmt/data-chunk arithmetic [[decode]] sizes
    * its output with, stopping before any nibble is read.
    */
  override def probeFrames(data: Array[Byte]): Option[Long] = {
    if (!supports(data)) return None
    val (fmtOff, fmtSize) = findFmt(data).get
    if (fmtSize < 16) return None
    val channels = u16(data, fmtOff + 2)
    val blockAlign = u16(data, fmtOff + 12)
    if (channels < 1 || channels > 8 || u16(data, fmtOff + 14) != 4) return None
    if (blockAlign < 4 * channels || blockAlign % (4 * channels) != 0) return None
    findChunk(data, "data").map { case (_, dataSize) =>
      (dataSize / blockAlign).toLong *
        ((blockAlign - 4 * channels) * 2 / channels + 1)
    }
  }

  def decode(data: Array[Byte]): Option[Array[Double]] = try {
    if (!supports(data)) return None
    val (fmtOff, fmtSize) = findFmt(data).get
    if (fmtSize < 16) return None
    val channels = u16(data, fmtOff + 2)
    val blockAlign = u16(data, fmtOff + 12)
    val bitsPerSample = u16(data, fmtOff + 14)
    if (channels < 1 || channels > 8 || bitsPerSample != 4) return None
    if (blockAlign < 4 * channels || blockAlign % (4 * channels) != 0) return None
    val (dataOff, dataSize) = findChunk(data, "data").getOrElse(return None)
    val samplesPerBlock = (blockAlign - 4 * channels) * 2 / channels + 1
    val nBlocks = dataSize / blockAlign
    val totalSamples = nBlocks.toLong * samplesPerBlock
    if (totalSamples > (1 << 26)) return None // same bound as JavaSoundPcm

    val out = new Array[Double](totalSamples.toInt)
    var blk = 0
    while (blk < nBlocks) {
      val base = dataOff + blk * blockAlign
      val pred = new Array[Int](channels)
      val index = new Array[Int](channels)
      var c = 0
      while (c < channels) {
        pred(c) = s16(data, base + 4 * c)
        index(c) = data(base + 4 * c + 2) & 0xff
        if (index(c) > 88) return None
        c += 1
      }
      val blockOut = Array.ofDim[Int](channels, samplesPerBlock)
      c = 0
      while (c < channels) { blockOut(c)(0) = pred(c); c += 1 }
      // nibble data: channels interleaved in 4-byte groups
      val dataBytesPerChannel = (blockAlign - 4 * channels) / channels
      val groups = dataBytesPerChannel / 4
      var g = 0
      while (g < groups) {
        c = 0
        while (c < channels) {
          val off = base + 4 * channels + g * 4 * channels + c * 4
          var b = 0
          while (b < 4) {
            val byte = data(off + b) & 0xff
            var n = 0
            while (n < 2) {
              val nib = if (n == 0) byte & 0xf else byte >> 4
              val si = 1 + g * 8 + b * 2 + n
              val (p, ix) = step(nib, pred(c), index(c))
              pred(c) = p; index(c) = ix
              if (si < samplesPerBlock) blockOut(c)(si) = p
              n += 1
            }
            b += 1
          }
          c += 1
        }
        g += 1
      }
      // mono mix, the JavaSoundPcm convention: average / 32768
      var s = 0
      while (s < samplesPerBlock) {
        var sum = 0.0
        c = 0
        while (c < channels) { sum += blockOut(c)(s) / 32768.0; c += 1 }
        out(blk * samplesPerBlock + s) = sum / channels
        s += 1
      }
      blk += 1
    }
    Some(out)
  } catch {
    case _: ArrayIndexOutOfBoundsException | _: NoSuchElementException |
         _: NegativeArraySizeException => None
  }
}

/** Pure-JVM Microsoft ADPCM decoder (WAVE format tag 0x0002) — the
  * OTHER legacy WAV compression (round 15, same rationale as
  * [[AdpcmDecoder]]: real corpora carry it, `javax.sound` cannot read
  * it). Second-order linear prediction with 7 standard coefficient
  * pairs, a per-block predictor choice, and a multiplicative delta
  * adaptation table.
  *
  * Verification (AdpcmSpec): the adaptation table carries two exact
  * structural invariants — symmetry `a(n) == a(16 - n)` for n in 1..7
  * (adaptation depends on nibble MAGNITUDE only) and the floor value
  * 230 on the small-magnitude arm — and every coefficient pair
  * satisfies the predictor stability bound `coef1 + coef2 <= 256`
  * (DC gain <= 1), with pair 0 the exact identity predictor (256, 0).
  * The decoder is pinned bit-exact against the in-repo test encoder's
  * reconstruction trace across all 7 predictors, plus routing and
  * corruption fuzz. Integer semantics follow the WAVE spec's C
  * arithmetic: prediction `/ 256` truncates toward zero, the delta
  * update `>> 8` floors (delta is non-negative).
  *
  * Block layout: per channel a predictor index byte, then per channel
  * int16 initial delta, sample1 (newer), sample2 (older); the block's
  * first two output samples are sample2 then sample1; nibble data is
  * high-nibble-first with channels alternating per nibble.
  */
object MsAdpcmDecoder extends AudioDecoder {

  /** delta adaptation per nibble (Microsoft WAVE spec). */
  val AdaptationTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  /** The 7 standard predictor coefficient pairs (×256). */
  val Coef1: Array[Int] = Array(256, 512, 0, 192, 240, 460, 392)
  val Coef2: Array[Int] = Array(0, -256, 0, 64, 0, -208, -232)

  def supports(d: Array[Byte]): Boolean =
    AdpcmDecoder.riffWave(d) && AdpcmDecoder.findChunkx(d, "fmt ").exists {
      case (off, _) => AdpcmDecoder.u16x(d, off) == 0x0002
    }

  /** Header-only twin of [[decode]]'s sizing arithmetic. */
  override def probeFrames(data: Array[Byte]): Option[Long] = {
    if (!supports(data)) return None
    val (fmtOff, fmtSize) = AdpcmDecoder.findChunkx(data, "fmt ").get
    if (fmtSize < 16) return None
    val channels = AdpcmDecoder.u16x(data, fmtOff + 2)
    val blockAlign = AdpcmDecoder.u16x(data, fmtOff + 12)
    if (channels < 1 || channels > 8 ||
      AdpcmDecoder.u16x(data, fmtOff + 14) != 4) return None
    val headerBytes = 7 * channels
    if (blockAlign <= headerBytes) return None
    if ((blockAlign - headerBytes) * 2 % channels != 0) return None
    AdpcmDecoder.findChunkx(data, "data").map { case (_, dataSize) =>
      (dataSize / blockAlign).toLong *
        ((blockAlign - headerBytes) * 2 / channels + 2)
    }
  }

  def decode(data: Array[Byte]): Option[Array[Double]] = try {
    if (!supports(data)) return None
    val (fmtOff, fmtSize) = AdpcmDecoder.findChunkx(data, "fmt ").get
    if (fmtSize < 16) return None
    val channels = AdpcmDecoder.u16x(data, fmtOff + 2)
    val blockAlign = AdpcmDecoder.u16x(data, fmtOff + 12)
    val bitsPerSample = AdpcmDecoder.u16x(data, fmtOff + 14)
    if (channels < 1 || channels > 8 || bitsPerSample != 4) return None
    val headerBytes = 7 * channels
    if (blockAlign <= headerBytes) return None
    if ((blockAlign - headerBytes) * 2 % channels != 0) return None
    val (dataOff, dataSize) =
      AdpcmDecoder.findChunkx(data, "data").getOrElse(return None)
    val samplesPerBlock = (blockAlign - headerBytes) * 2 / channels + 2
    val nBlocks = dataSize / blockAlign
    val totalSamples = nBlocks.toLong * samplesPerBlock
    if (totalSamples > (1 << 26)) return None

    val out = new Array[Double](totalSamples.toInt)
    var blk = 0
    while (blk < nBlocks) {
      val base = dataOff + blk * blockAlign
      val coef1 = new Array[Int](channels)
      val coef2 = new Array[Int](channels)
      val delta = new Array[Int](channels)
      val s1 = new Array[Int](channels)
      val s2 = new Array[Int](channels)
      var c = 0
      while (c < channels) {
        val p = data(base + c) & 0xff
        if (p >= Coef1.length) return None
        coef1(c) = Coef1(p); coef2(c) = Coef2(p)
        delta(c) = AdpcmDecoder.s16x(data, base + channels + 2 * c)
        if (delta(c) < 16) delta(c) = 16
        s1(c) = AdpcmDecoder.s16x(data, base + 3 * channels + 2 * c)
        s2(c) = AdpcmDecoder.s16x(data, base + 5 * channels + 2 * c)
        c += 1
      }
      val o0 = blk * samplesPerBlock
      val block = Array.ofDim[Int](channels, samplesPerBlock)
      c = 0
      while (c < channels) { block(c)(0) = s2(c); block(c)(1) = s1(c); c += 1 }
      // nibbles: high first, channels alternating per nibble
      val nNibbles = (samplesPerBlock - 2) * channels
      var i = 0
      while (i < nNibbles) {
        val byte = data(base + headerBytes + (i >> 1)) & 0xff
        val nib = if ((i & 1) == 0) byte >> 4 else byte & 0xf
        val ch = i % channels
        val si = 2 + i / channels
        val signed = if (nib >= 8) nib - 16 else nib
        var pred = (s1(ch) * coef1(ch) + s2(ch) * coef2(ch)) / 256
        pred += signed * delta(ch)
        if (pred > 32767) pred = 32767
        if (pred < -32768) pred = -32768
        s2(ch) = s1(ch); s1(ch) = pred
        delta(ch) = (AdaptationTable(nib) * delta(ch)) >> 8
        if (delta(ch) < 16) delta(ch) = 16
        block(ch)(si) = pred
        i += 1
      }
      var s = 0
      while (s < samplesPerBlock) {
        var sum = 0.0
        c = 0
        while (c < channels) { sum += block(c)(s) / 32768.0; c += 1 }
        out(o0 + s) = sum / channels
        s += 1
      }
      blk += 1
    }
    Some(out)
  } catch {
    case _: ArrayIndexOutOfBoundsException | _: NoSuchElementException |
         _: NegativeArraySizeException => None
  }
}
