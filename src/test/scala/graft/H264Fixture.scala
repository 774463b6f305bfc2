package graft

import scala.collection.mutable.ArrayBuffer

import graft.operators.multimodal.H264

/** Test-side H.264 baseline-intra ENCODER + an independent reference
  * reconstruction, both written from the published spec text — the
  * validation harness for [[H264]]:
  *
  *  - the encoder emits real Annex-B streams (SPS/PPS/IDR, CAVLC,
  *    emulation prevention) from explicit per-MB descriptions, so the
  *    decoder's parse path is exercised bit-for-bit;
  *  - [[RefRecon]] reconstructs the same frame directly from the MB
  *    descriptions with fresh, simple 2-D-array code (no bitstream,
  *    no shared helpers with the decoder), so the decoder's
  *    prediction/transform arithmetic is cross-checked against an
  *    independent implementation of the same spec clauses.
  *
  * The CAVLC tables themselves are shared with the decoder (there is
  * only one Table 9-5); H264Spec pins them structurally (prefix-free,
  * Kraft-complete, CBP a permutation) and bit-for-bit on the worked
  * example published in the open literature.
  */
object H264Fixture {

  // ---------------- bit writer ----------------

  final class BitWriter {
    private val bytes = new ArrayBuffer[Byte]()
    private var acc = 0
    private var nbits = 0
    def u1(b: Int): Unit = {
      acc = acc << 1 | (b & 1)
      nbits += 1
      if (nbits == 8) { bytes += acc.toByte; acc = 0; nbits = 0 }
    }
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { u1((v >> i) & 1); i -= 1 }
    }
    def bits(s: String): Unit = s.foreach(c => u1(c - '0'))
    def ue(v: Int): Unit = {
      val code = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(code)
      u(0, len - 1)
      u(code, len)
    }
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def byteAlignZeros(): Unit = while (nbits != 0) u1(0)
    /** cabac_alignment_one_bit padding (7.3.4). */
    def byteAlignOnes(): Unit = while (nbits != 0) u1(1)
    def alignedByte(v: Int): Unit = {
      require(nbits == 0, "not byte aligned")
      bytes += v.toByte
    }
    /** rbsp_trailing_bits: stop bit + zero padding. */
    def trailing(): Unit = { u1(1); byteAlignZeros() }
    def toRbsp: Array[Byte] = {
      require(nbits == 0, "unterminated bitstream")
      bytes.toArray
    }
  }

  /** Wrap an RBSP as an Annex-B NAL: 4-byte start code, header, and
    * emulation-prevention escaping (00 00 {00,01,02,03} -> 00 00 03 xx).
    */
  def nal(nalType: Int, refIdc: Int, rbsp: Array[Byte]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    out ++= Array[Byte](0, 0, 0, 1)
    out += ((refIdc << 5) | nalType).toByte
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros >= 2 && (b & 0xff) <= 3) { out += 3; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  def spsNal(mbW: Int, mbH: Int, cropR: Int = 0, cropB: Int = 0): Array[Byte] = {
    val w = new BitWriter
    w.u(66, 8) // profile_idc: Baseline
    w.u(0, 8) // constraint flags + reserved
    w.u(30, 8) // level_idc
    w.ue(0) // seq_parameter_set_id
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(2) // pic_order_cnt_type = 2 (no extra syntax)
    w.ue(1) // max_num_ref_frames
    w.u1(0) // gaps_in_frame_num_value_allowed_flag
    w.ue(mbW - 1)
    w.ue(mbH - 1)
    w.u1(1) // frame_mbs_only_flag
    w.u1(0) // direct_8x8_inference_flag
    if (cropR > 0 || cropB > 0) {
      w.u1(1); w.ue(0); w.ue(cropR); w.ue(0); w.ue(cropB)
    } else w.u1(0)
    w.u1(0) // vui_parameters_present_flag
    w.trailing()
    nal(7, 3, w.toRbsp)
  }

  def ppsNal(picInitQp: Int, cabac: Boolean = false): Array[Byte] = {
    val w = new BitWriter
    w.ue(0) // pic_parameter_set_id
    w.ue(0) // seq_parameter_set_id
    w.u1(if (cabac) 1 else 0) // entropy_coding_mode_flag
    w.u1(0) // bottom_field_pic_order_in_frame_present_flag
    w.ue(0) // num_slice_groups_minus1
    w.ue(0); w.ue(0) // num_ref_idx defaults
    w.u1(0) // weighted_pred_flag
    w.u(0, 2) // weighted_bipred_idc
    w.se(picInitQp - 26)
    w.se(0) // pic_init_qs
    w.se(0) // chroma_qp_index_offset
    w.u1(1) // deblocking_filter_control_present_flag
    w.u1(0) // constrained_intra_pred_flag
    w.u1(0) // redundant_pic_cnt_present_flag
    w.trailing()
    nal(8, 3, w.toRbsp)
  }

  // ---------------- CAVLC residual encoder ----------------

  /** Encode one residual block (coefficients in zigzag order, length
    * maxNumCoeff) per spec 9.2 — the exact inverse of
    * [[H264]].residualBlock. Returns TotalCoeff (the caller records it
    * for neighbor nC bookkeeping).
    */
  def writeResidual(w: BitWriter, zz: Array[Int], nC: Int,
                    maxNumCoeff: Int): Int = {
    require(zz.length == maxNumCoeff, s"zz len ${zz.length} != $maxNumCoeff")
    val nz = zz.zipWithIndex.filter(_._1 != 0) // (level, pos) ascending
    val totalCoeff = nz.length
    require(totalCoeff <= maxNumCoeff)
    // reversed: highest frequency first
    val rev = nz.reverse
    var trailingOnes = 0
    while (trailingOnes < 3 && trailingOnes < totalCoeff &&
      math.abs(rev(trailingOnes)._1) == 1) trailingOnes += 1
    // coeff_token
    val token = H264.ct(totalCoeff, trailingOnes)
    if (nC >= 8) {
      val v = if (totalCoeff == 0) 3 else ((totalCoeff - 1) << 2) | trailingOnes
      w.u(v, 6)
    } else {
      val table =
        if (nC == -1) H264.CoeffTokenChromaDc
        else if (nC < 2) H264.CoeffTokenNc0
        else if (nC < 4) H264.CoeffTokenNc2
        else H264.CoeffTokenNc4
      w.bits(table.byValue(token))
    }
    if (totalCoeff == 0) return 0
    // trailing-one signs, then levels
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    var i = 0
    while (i < totalCoeff) {
      val level = rev(i)._1
      if (i < trailingOnes) w.u1(if (level < 0) 1 else 0)
      else {
        var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
        if (i == trailingOnes && trailingOnes < 3) levelCode -= 2
        if (suffixLength == 0) {
          if (levelCode < 14) { w.u(0, levelCode); w.u1(1) }
          else if (levelCode < 30) {
            w.u(0, 14); w.u1(1); w.u(levelCode - 14, 4)
          } else {
            require(levelCode < 30 + 4096, "level out of test-encoder range")
            w.u(0, 15); w.u1(1); w.u(levelCode - 30, 12)
          }
        } else {
          if (levelCode < (15 << suffixLength)) {
            w.u(0, levelCode >> suffixLength); w.u1(1)
            w.u(levelCode & ((1 << suffixLength) - 1), suffixLength)
          } else {
            val rem = levelCode - (15 << suffixLength)
            require(rem < 4096, "level out of test-encoder range")
            w.u(0, 15); w.u1(1); w.u(rem, 12)
          }
        }
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }
    // total_zeros
    val highest = nz.last._2
    var zerosLeft = highest + 1 - totalCoeff
    if (totalCoeff < maxNumCoeff) {
      val tz =
        if (nC == -1) H264.TotalZerosChromaDc(totalCoeff)
        else H264.TotalZeros4x4(totalCoeff)
      w.bits(tz.byValue(zerosLeft))
    }
    // run_before, highest frequency first
    i = 0
    while (i < totalCoeff - 1 && zerosLeft > 0) {
      val run = rev(i)._2 - rev(i + 1)._2 - 1
      w.bits(H264.RunBefore(math.min(zerosLeft, 7)).byValue(run))
      zerosLeft -= run
      i += 1
    }
    totalCoeff
  }

  // ---------------- per-MB descriptions ----------------

  sealed trait Mb
  /** 16x16 luma + two 8x8 chroma sample grids, row-major. */
  final case class Pcm(y: Array[Int], cb: Array[Int], cr: Array[Int]) extends Mb
  /** I_16x16: ac == null means CodedBlockPatternLuma == 0; dc is the
    * 16 quantized Hadamard-domain DC coefficients in zigzag; ac(b) is
    * block b's 15 AC coefficients in zigzag-from-1. cbDc/crDc are the
    * 4 quantized 2x2-Hadamard-domain chroma DC coeffs; cbAc/crAc
    * present iff cbpChroma == 2.
    */
  final case class I16(predMode: Int, dc: Array[Int],
                       ac: Array[Array[Int]], cbpChroma: Int,
                       cbDc: Array[Int], crDc: Array[Int],
                       cbAc: Array[Array[Int]], crAc: Array[Array[Int]],
                       chromaMode: Int) extends Mb
  /** I_4x4: blocks(b) is 16 zigzag coeffs (must be all-zero for every
    * b whose 8x8 is not in cbpLuma).
    */
  final case class I4(modes: Array[Int], chromaMode: Int,
                      cbpLuma: Int, cbpChroma: Int,
                      blocks: Array[Array[Int]],
                      cbDc: Array[Int], crDc: Array[Int],
                      cbAc: Array[Array[Int]], crAc: Array[Array[Int]]) extends Mb

  /** Encode a one-IDR-frame Annex-B stream (SPS + PPS + slice).
    * `qpDeltas(addr)` (optional) emits nonzero mb_qp_delta for MBs that
    * carry the element — the CABAC/CAVLC cross-twin spec uses it to
    * exercise both entropy codings of the delta against each other.
    */
  def encodeFrame(mbW: Int, mbH: Int, mbs: Seq[Mb], qp: Int,
                  cropR: Int = 0, cropB: Int = 0,
                  qpDeltas: Seq[Int] = null): Array[Byte] = {
    def deltaOf(addr: Int): Int = if (qpDeltas == null) 0 else qpDeltas(addr)
    require(mbs.length == mbW * mbH)
    val w = new BitWriter
    // slice header (IDR)
    w.ue(0) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices in pic)
    w.ue(0) // pic_parameter_set_id
    w.u(0, 4) // frame_num
    w.ue(0) // idr_pic_id
    w.u1(0); w.u1(0) // dec_ref_pic_marking: IDR flags
    w.se(0) // slice_qp_delta (qp == pic_init_qp)
    w.ue(1) // disable_deblocking_filter_idc = 1 (exact reconstruction)

    // nC bookkeeping mirrors the decoder's 9.2.1 derivation
    val lumaNz = Array.fill(mbH * 4, mbW * 4)(-1)
    val cbNz = Array.fill(mbH * 2, mbW * 2)(-1)
    val crNz = Array.fill(mbH * 2, mbW * 2)(-1)
    val predModes = Array.fill(mbH * 4, mbW * 4)(-1)
    def lumaNC(bx: Int, by: Int): Int = {
      val nA = if (bx > 0) lumaNz(by)(bx - 1) else -1
      val nB = if (by > 0) lumaNz(by - 1)(bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA else if (nB >= 0) nB else 0
    }
    def chromaNC(nz: Array[Array[Int]], bx: Int, by: Int): Int = {
      val nA = if (bx > 0) nz(by)(bx - 1) else -1
      val nB = if (by > 0) nz(by - 1)(bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA else if (nB >= 0) nB else 0
    }

    mbs.zipWithIndex.foreach { case (mb, addr) =>
      val mbX = addr % mbW
      val mbY = addr / mbW
      mb match {
        case Pcm(y, cbP, crP) =>
          w.ue(25)
          w.byteAlignZeros()
          y.foreach(w.alignedByte)
          cbP.foreach(w.alignedByte)
          crP.foreach(w.alignedByte)
          for (b <- 0 until 16) {
            val (px, py) = H264.Luma4x4Pos(b)
            lumaNz(mbY * 4 + py / 4)(mbX * 4 + px / 4) = 16
          }
          for (cy <- 0 until 2; cx <- 0 until 2) {
            cbNz(mbY * 2 + cy)(mbX * 2 + cx) = 16
            crNz(mbY * 2 + cy)(mbX * 2 + cx) = 16
          }

        case m: I16 =>
          val cbpLuma15 = m.ac != null
          w.ue(1 + m.predMode + 4 * m.cbpChroma + (if (cbpLuma15) 12 else 0))
          w.ue(m.chromaMode)
          w.se(deltaOf(addr)) // mb_qp_delta (I_16x16 always carries it)
          // DC: nC as for luma block 0
          writeResidual(w, m.dc, lumaNC(mbX * 4, mbY * 4), 16)
          for (b <- 0 until 16) {
            val (px, py) = H264.Luma4x4Pos(b)
            val bx = mbX * 4 + px / 4
            val by = mbY * 4 + py / 4
            if (cbpLuma15) {
              val tc = writeResidual(w, m.ac(b), lumaNC(bx, by), 15)
              lumaNz(by)(bx) = tc
            } else lumaNz(by)(bx) = 0
          }
          writeChroma(w, m.cbpChroma, m.cbDc, m.crDc, m.cbAc, m.crAc,
            mbX, mbY, cbNz, crNz, chromaNC)

        case m: I4 =>
          w.ue(0)
          for (b <- 0 until 16) {
            val (px, py) = H264.Luma4x4Pos(b)
            val bx = mbX * 4 + px / 4
            val by = mbY * 4 + py / 4
            val mA =
              if (bx > 0 && predModes(by)(bx - 1) >= 0) predModes(by)(bx - 1)
              else if (bx > 0 && lumaNz(by)(bx - 1) >= 0) 2
              else -1
            val mB =
              if (by > 0 && predModes(by - 1)(bx) >= 0) predModes(by - 1)(bx)
              else if (by > 0 && lumaNz(by - 1)(bx) >= 0) 2
              else -1
            val predicted = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
            val mode = m.modes(b)
            if (mode == predicted) w.u1(1)
            else {
              w.u1(0)
              w.u(if (mode < predicted) mode else mode - 1, 3)
            }
            predModes(by)(bx) = mode
          }
          w.ue(m.chromaMode)
          val cbp = m.cbpLuma | (m.cbpChroma << 4)
          w.ue(H264.CbpIntraInv(cbp))
          if (cbp > 0) w.se(deltaOf(addr)) // mb_qp_delta
          for (b <- 0 until 16) {
            val (px, py) = H264.Luma4x4Pos(b)
            val bx = mbX * 4 + px / 4
            val by = mbY * 4 + py / 4
            if (((m.cbpLuma >> (b / 4)) & 1) == 1) {
              val tc = writeResidual(w, m.blocks(b), lumaNC(bx, by), 16)
              lumaNz(by)(bx) = tc
            } else {
              require(m.blocks(b).forall(_ == 0),
                s"block $b carries coeffs outside cbpLuma")
              lumaNz(by)(bx) = 0
            }
          }
          writeChroma(w, m.cbpChroma, m.cbDc, m.crDc, m.cbAc, m.crAc,
            mbX, mbY, cbNz, crNz, chromaNC)
      }
    }
    w.trailing()
    spsNal(mbW, mbH, cropR, cropB) ++ ppsNal(qp) ++ nal(5, 3, w.toRbsp)
  }

  private def writeChroma(w: BitWriter, cbpChroma: Int,
                          cbDc: Array[Int], crDc: Array[Int],
                          cbAc: Array[Array[Int]], crAc: Array[Array[Int]],
                          mbX: Int, mbY: Int,
                          cbNz: Array[Array[Int]], crNz: Array[Array[Int]],
                          chromaNC: (Array[Array[Int]], Int, Int) => Int): Unit = {
    if (cbpChroma != 0) {
      writeResidual(w, cbDc, -1, 4)
      writeResidual(w, crDc, -1, 4)
    } else {
      require(cbDc.forall(_ == 0) && crDc.forall(_ == 0),
        "chroma DC coeffs outside cbpChroma")
    }
    for ((nz, ac) <- Seq((cbNz, cbAc), (crNz, crAc))) {
      for (cbIdx <- 0 until 4) {
        val bx = mbX * 2 + cbIdx % 2
        val by = mbY * 2 + cbIdx / 2
        if (cbpChroma == 2) {
          val tc = writeResidual(w, ac(cbIdx), chromaNC(nz, bx, by), 15)
          nz(by)(bx) = tc
        } else {
          require(ac == null || ac(cbIdx).forall(_ == 0),
            "chroma AC coeffs outside cbpChroma")
          nz(by)(bx) = 0
        }
      }
    }
  }
}
