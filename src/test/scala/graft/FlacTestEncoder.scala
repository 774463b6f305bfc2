package graft

import scala.collection.mutable.ArrayBuffer

/** Minimal FLAC ENCODER, test scope only — produces spec-conformant
  * streams to pin [[graft.operators.multimodal.FlacDecoder]] with.
  * Written independently from the RFC 9639 bitstream description
  * (including its own CRC implementations), so an encoder/decoder
  * agreement bug would have to be made twice from the prose to cancel
  * out; the roundtrip tests additionally compare against the SAME PCM
  * decoded from a WAV twin through `javax.sound`, which neither side
  * of this pair touches.
  *
  * Supports every subframe shape the decoder claims: CONSTANT,
  * VERBATIM, FIXED 0-4, LPC, Rice partitions of any order, escaped raw
  * partitions, wasted bits, mono/stereo/multi-channel, and the three
  * stereo decorrelation modes.
  */
object FlacTestEncoder {

  sealed trait Sub
  case object Verbatim extends Sub
  case object Constant extends Sub // caller guarantees constant samples
  /** FIXED predictor; `escape` forces raw-escaped partitions. */
  final case class Fixed(order: Int, partOrder: Int = 0,
                         escape: Boolean = false) extends Sub
  /** LPC with caller-chosen quantized coefficients. */
  final case class Lpc(coefs: Array[Int], precision: Int, shift: Int,
                       partOrder: Int = 0) extends Sub
  /** Any inner strategy with `w` wasted bits (samples must be
    * divisible by 2^w — caller's job).
    */
  final case class Wasted(w: Int, inner: Sub) extends Sub

  /** Stereo decorrelation for 2-channel input. */
  sealed trait StereoMode { def code: Int }
  case object Independent extends StereoMode { def code = -1 }
  case object LeftSide extends StereoMode { def code = 8 }
  case object RightSide extends StereoMode { def code = 9 }
  case object MidSide extends StereoMode { def code = 10 }

  private final class BitWriter {
    private val buf = new ArrayBuffer[Byte]()
    private var cur = 0
    private var n = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      n += 1
      if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
    }
    def bits(v: Long, width: Int): Unit = {
      var i = width - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (n != 0) bit(0)
    def isAligned: Boolean = n == 0
    def bytes: Array[Byte] = { require(n == 0, "unaligned"); buf.toArray }
    def size: Int = buf.size
  }

  // independent CRCs (the decoder has its own)
  private def crc8(d: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    for (i <- from until until) {
      c ^= d(i) & 0xff
      for (_ <- 0 until 8) c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff
                               else (c << 1) & 0xff
    }
    c
  }
  private def crc16(d: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    for (i <- from until until) {
      c ^= (d(i) & 0xff) << 8
      for (_ <- 0 until 8) c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
                               else (c << 1) & 0xffff
    }
    c
  }

  private def utf8Coded(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) { w.bits(v, 8); return }
    // k continuation bytes; header byte has k+1 leading ones
    var k = 1
    while (v >= (1L << (6 * k + (6 - k))) && k < 6) k += 1
    val headerOnes = k + 1
    val headerPayloadBits = 7 - headerOnes
    w.bits((0xff << (8 - headerOnes)) & 0xff | ((v >> (6 * k)) & ((1 << headerPayloadBits) - 1)), 8)
    var i = k - 1
    while (i >= 0) {
      w.bits(0x80L | ((v >> (6 * i)) & 0x3f), 8)
      i -= 1
    }
  }

  private def zigzag(r: Int): Long = ((r.toLong << 1) ^ (r.toLong >> 63)) & 0xffffffffL

  private def writeResidual(w: BitWriter, res: Array[Int], blockSize: Int,
                            order: Int, partOrder: Int, escape: Boolean): Unit = {
    w.bits(0, 2) // 4-bit rice method
    w.bits(partOrder, 4)
    val nParts = 1 << partOrder
    val partLen = blockSize >> partOrder
    var i = 0
    for (p <- 0 until nParts) {
      val n = if (p == 0) partLen - order else partLen
      val slice = res.slice(i, i + n)
      i += n
      if (escape) {
        val need = slice.foldLeft(1) { (m, r) =>
          // two's-complement width for r
          var b = 1
          while (b < 32 && (r < -(1 << (b - 1)) || r >= (1 << (b - 1)))) b += 1
          math.max(m, b)
        }
        w.bits(15, 4) // escape
        w.bits(need, 5)
        slice.foreach(r => w.bits(r.toLong & ((1L << need) - 1), need))
      } else {
        // pick the cheapest rice parameter for this partition
        val param = (0 to 14).minBy { p0 =>
          slice.foldLeft(0L)((acc, r) => acc + (zigzag(r) >>> p0) + 1 + p0)
        }
        w.bits(param, 4)
        slice.foreach { r =>
          val u = zigzag(r)
          val q = (u >>> param).toInt
          for (_ <- 0 until q) w.bit(0)
          w.bit(1)
          if (param > 0) w.bits(u & ((1L << param) - 1), param)
        }
      }
    }
  }

  private def fixedResidual(order: Int, s: Array[Int]): Array[Int] =
    (order until s.length).map { i =>
      val pred = order match {
        case 0 => 0L
        case 1 => s(i - 1).toLong
        case 2 => 2L * s(i - 1) - s(i - 2)
        case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
        case 4 => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
      }
      (s(i) - pred).toInt
    }.toArray

  private def writeSubframe(w: BitWriter, samples: Array[Int], bps: Int,
                            sub: Sub): Unit = sub match {
    case Wasted(wb, inner) =>
      require(samples.forall(s => (s >> wb) << wb == s), "not divisible")
      w.bit(0)
      val tpeBitsStart = innerType(inner)
      w.bits(tpeBitsStart, 6)
      w.bit(1) // wasted flag
      for (_ <- 1 until wb) w.bit(0)
      w.bit(1) // unary terminator: wasted = zeros + 1
      writeBody(w, samples.map(_ >> wb), bps - wb, inner)
    case s =>
      w.bit(0)
      w.bits(innerType(s), 6)
      w.bit(0) // no wasted bits
      writeBody(w, samples, bps, s)
  }

  private def innerType(s: Sub): Int = s match {
    case Constant => 0
    case Verbatim => 1
    case Fixed(o, _, _) => 8 + o
    case Lpc(c, _, _, _) => 32 + c.length - 1
    case Wasted(_, _) => throw new IllegalArgumentException("no nested Wasted")
  }

  private def writeBody(w: BitWriter, s: Array[Int], bps: Int, sub: Sub): Unit =
    sub match {
      case Constant =>
        require(s.forall(_ == s(0)), "Constant needs constant samples")
        w.bits(s(0).toLong & ((1L << bps) - 1), bps)
      case Verbatim =>
        s.foreach(v => w.bits(v.toLong & ((1L << bps) - 1), bps))
      case Fixed(order, partOrder, escape) =>
        (0 until order).foreach(i => w.bits(s(i).toLong & ((1L << bps) - 1), bps))
        writeResidual(w, fixedResidual(order, s), s.length, order, partOrder, escape)
      case Lpc(coefs, precision, shift, partOrder) =>
        val order = coefs.length
        (0 until order).foreach(i => w.bits(s(i).toLong & ((1L << bps) - 1), bps))
        w.bits(precision - 1, 4)
        w.bits(shift.toLong & 0x1f, 5)
        coefs.foreach(c => w.bits(c.toLong & ((1L << precision) - 1), precision))
        val res = (order until s.length).map { i =>
          var acc = 0L
          for (j <- 0 until order) acc += coefs(j).toLong * s(i - 1 - j)
          (s(i) - (acc >> shift)).toInt
        }.toArray
        writeResidual(w, res, s.length, order, partOrder, escape = false)
      case Wasted(_, _) => throw new IllegalStateException
    }

  /** Encode `channels` (equal-length per-channel sample arrays) as one
    * FLAC stream. `sub(frameIdx, chIdx)` picks the subframe strategy.
    */
  def encode(channels: Array[Array[Int]], bps: Int, sampleRate: Int,
             blockSize: Int, stereo: StereoMode = Independent,
             sub: (Int, Int) => Sub = (_, _) => Verbatim,
             totalSamplesOverride: Long = -1L,
             siBpsOverride: Int = -1): Array[Byte] = {
    require(channels.nonEmpty && channels.forall(_.length == channels(0).length))
    val total = channels(0).length
    val head = new BitWriter
    head.bits('f', 8); head.bits('L', 8); head.bits('a', 8); head.bits('C', 8)
    // STREAMINFO, last metadata block
    head.bit(1); head.bits(0, 7); head.bits(34, 24)
    head.bits(blockSize, 16); head.bits(blockSize, 16)
    head.bits(0, 24); head.bits(0, 24)
    head.bits(sampleRate, 20)
    head.bits(channels.length - 1, 3)
    // siBpsOverride lets a spec construct the RFC-9639-invalid case
    // where STREAMINFO bps disagrees with every frame header's coded
    // sample size — the decoder must degrade to None, not decode at
    // the wrong amplitude
    head.bits((if (siBpsOverride > 0) siBpsOverride else bps) - 1, 5)
    head.bits(if (totalSamplesOverride >= 0) totalSamplesOverride else total.toLong, 36)
    for (_ <- 0 until 16) head.bits(0, 8) // MD5 unset
    val out = new ArrayBuffer[Byte]()
    out ++= head.bytes

    var off = 0
    var frameIdx = 0
    while (off < total) {
      val n = math.min(blockSize, total - off)
      val w = new BitWriter
      w.bits(0x3ffe, 14) // sync
      w.bit(0)           // reserved
      w.bit(0)           // fixed blocking
      w.bits(7, 4)       // block size: 16-bit at end
      w.bits(0, 4)       // sample rate: streaminfo
      val chCode = if (stereo == Independent) channels.length - 1 else stereo.code
      w.bits(chCode, 4)
      val ssCode = bps match {
        case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
        case _ => 0 // from streaminfo
      }
      w.bits(ssCode, 3)
      w.bit(0) // reserved
      utf8Coded(w, frameIdx.toLong)
      w.bits(n - 1, 16)
      require(w.isAligned)
      val headerBytes = w.bytes
      w.bits(crc8(headerBytes, 0, headerBytes.length), 8)

      // per-channel frame samples under the decorrelation mode
      val frameCh: Array[(Array[Int], Int)] = stereo match {
        case Independent =>
          channels.map(c => (c.slice(off, off + n), bps))
        case LeftSide =>
          val l = channels(0).slice(off, off + n)
          val r = channels(1).slice(off, off + n)
          Array((l, bps), (l.indices.map(i => l(i) - r(i)).toArray, bps + 1))
        case RightSide =>
          val l = channels(0).slice(off, off + n)
          val r = channels(1).slice(off, off + n)
          Array((l.indices.map(i => l(i) - r(i)).toArray, bps + 1), (r, bps))
        case MidSide =>
          val l = channels(0).slice(off, off + n)
          val r = channels(1).slice(off, off + n)
          Array((l.indices.map(i => (l(i) + r(i)) >> 1).toArray, bps),
            (l.indices.map(i => l(i) - r(i)).toArray, bps + 1))
      }
      frameCh.zipWithIndex.foreach { case ((s, chBps), ci) =>
        writeSubframe(w, s, chBps, sub(frameIdx, ci))
      }
      w.align()
      val frameBytes = w.bytes
      w.bits(crc16(frameBytes, 0, frameBytes.length), 16)
      out ++= w.bytes
      off += n
      frameIdx += 1
    }
    out.toArray
  }
}
