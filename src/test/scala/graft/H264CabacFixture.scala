package graft

import graft.operators.multimodal.{H264, H264Cabac}
import H264Fixture.{BitWriter, I16, I4, Mb, nal, ppsNal, spsNal}

/** Test-side CABAC ENCODER for [[H264Cabac]] — the same role
  * H264Fixture's CAVLC writer plays for the baseline decoder: emit real
  * Annex-B streams from explicit per-MB descriptions so the decoder's
  * parse path is exercised bit-for-bit against [[H264RefRecon]].
  *
  * Independence discipline: the arithmetic ENCODER (9.3.4 flowcharts —
  * low/range, outstanding bits, flush) and every neighbor-context
  * derivation here are written independently of the decoder's code:
  * contexts are
  * computed directly from the immutable Mb descriptions (global lookups
  * over the frame's block data), not from the decoder's incremental
  * grids — so a derivation bug on either side breaks the roundtrip
  * instead of cancelling out. The probability TABLES (RangeLps,
  * TransIdxLps, CtxInit) are necessarily shared data: they define the
  * bitstream (see ROUND15_NOTES.md for the epistemic boundary).
  *
  * I_PCM is not encodable under CABAC here (out of decode scope too).
  */
object H264CabacFixture {

  /** Arithmetic encoding engine (9.3.4.2-9.3.4.6) over a BitWriter. */
  final class Encoder(w: BitWriter, sliceQp: Int) {
    private val pState = new Array[Int](H264Cabac.NumCtx)
    private val valMps = new Array[Int](H264Cabac.NumCtx)
    locally {
      val qp = math.max(0, math.min(51, sliceQp))
      var i = 0
      while (i < H264Cabac.NumCtx) {
        val (m, n) = H264Cabac.CtxInit(i)
        val pre = math.max(1, math.min(126, ((m * qp) >> 4) + n))
        if (pre <= 63) { pState(i) = 63 - pre; valMps(i) = 0 }
        else { pState(i) = pre - 64; valMps(i) = 1 }
        i += 1
      }
    }
    private var low = 0
    private var range = 510
    private var firstBit = true
    private var outstanding = 0

    private def putBit(b: Int): Unit = {
      if (firstBit) firstBit = false else w.u1(b)
      while (outstanding > 0) { w.u1(1 - b); outstanding -= 1 }
    }
    private def renorm(): Unit = {
      while (range < 256) {
        if (low < 256) putBit(0)
        else if (low >= 512) { putBit(1); low -= 512 }
        else { outstanding += 1; low -= 256 }
        low <<= 1
        range <<= 1
      }
    }
    def decision(ctxIdx: Int, bin: Int): Unit = {
      val s = pState(ctxIdx)
      val rLps = H264Cabac.RangeLps(s)((range >> 6) & 3)
      range -= rLps
      if (bin != valMps(ctxIdx)) {
        low += range
        range = rLps
        if (s == 0) valMps(ctxIdx) = 1 - valMps(ctxIdx)
        pState(ctxIdx) = H264Cabac.TransIdxLps(s)
      } else {
        pState(ctxIdx) = if (s < 62) s + 1 else 62
      }
      renorm()
    }
    def bypass(bin: Int): Unit = {
      low <<= 1
      if (bin == 1) low += range
      if (low >= 1024) { putBit(1); low -= 1024 }
      else if (low < 512) putBit(0)
      else { outstanding += 1; low -= 512 }
    }
    /** EncodeTerminate; bin 1 also flushes (9.3.4.5/9.3.4.6) — the
      * flush's final written '1' is the rbsp_stop_one_bit.
      */
    def terminate(bin: Int): Unit = {
      range -= 2
      if (bin == 1) {
        low += range
        // flush
        range = 2
        renorm()
        putBit((low >> 9) & 1)
        w.u(((low >> 7) & 3) | 1, 2)
      } else renorm()
    }
  }

  // ---- independent per-frame fact lookups over the Mb descriptions ----

  private def isI4(mb: Mb): Boolean = mb.isInstanceOf[I4]
  private def cbpLumaOf(mb: Mb): Int = mb match {
    case m: I4 => m.cbpLuma
    case m: I16 => if (m.ac != null) 15 else 0
    case _ => 15
  }
  private def cbpChromaOf(mb: Mb): Int = mb match {
    case m: I4 => m.cbpChroma
    case m: I16 => m.cbpChroma
    case _ => 2
  }
  private def chromaModeOf(mb: Mb): Int = mb match {
    case m: I4 => m.chromaMode
    case m: I16 => m.chromaMode
    case _ => 0
  }
  /** cbf of luma 4x4 block b (decode order) — 0 when the block carries
    * no residual parse (cbp gate off).
    */
  private def lumaCbf(mb: Mb, b: Int): Int = mb match {
    case m: I4 =>
      if (((m.cbpLuma >> (b / 4)) & 1) == 0) 0
      else if (m.blocks(b).exists(_ != 0)) 1 else 0
    case m: I16 =>
      if (m.ac == null) 0 else if (m.ac(b).exists(_ != 0)) 1 else 0
    case _ => 1
  }
  private def lumaDcCbf(mb: Mb): Int = mb match {
    case m: I16 => if (m.dc.exists(_ != 0)) 1 else 0
    case _ => 0 // not present for I_4x4 neighbors
  }
  private def chromaDcCbf(mb: Mb, comp: Int): Int = mb match {
    case m: I4 if m.cbpChroma != 0 =>
      if ((if (comp == 0) m.cbDc else m.crDc).exists(_ != 0)) 1 else 0
    case m: I16 if m.cbpChroma != 0 =>
      if ((if (comp == 0) m.cbDc else m.crDc).exists(_ != 0)) 1 else 0
    case _ => 0
  }
  private def chromaAcCbf(mb: Mb, comp: Int, cbIdx: Int): Int = mb match {
    case m: I4 if m.cbpChroma == 2 =>
      if ((if (comp == 0) m.cbAc else m.crAc)(cbIdx).exists(_ != 0)) 1 else 0
    case m: I16 if m.cbpChroma == 2 =>
      if ((if (comp == 0) m.cbAc else m.crAc)(cbIdx).exists(_ != 0)) 1 else 0
    case _ => 0
  }

  private val SigCatOff = Array(0, 15, 29, 44, 47)
  private val AbsCatOff = Array(0, 10, 20, 30, 39)

  /** Encode one residual block: coded_block_flag, significance map,
    * UEG0 levels (reverse scan), bypass signs.
    */
  private def writeResidual(e: Encoder, zz: Array[Int], cat: Int,
                            condA: Int, condB: Int): Unit = {
    val cbf = if (zz.exists(_ != 0)) 1 else 0
    e.decision(85 + 4 * cat + condA + 2 * condB, cbf)
    if (cbf == 0) return
    val n = zz.length
    var last = n - 1
    while (zz(last) == 0) last -= 1
    var i = 0
    while (i < n - 1 && i <= last) {
      val sig = if (zz(i) != 0) 1 else 0
      e.decision(105 + SigCatOff(cat) + i, sig)
      if (sig == 1) e.decision(166 + SigCatOff(cat) + i, if (i == last) 1 else 0)
      i += 1
    }
    // position n-1 significant => inferred by the decoder (no bins)
    var numGt1 = 0
    var numEq1 = 0
    var idx = last
    while (idx >= 0) {
      if (zz(idx) != 0) {
        val level = math.abs(zz(idx))
        val absM1 = level - 1
        val base = 227 + AbsCatOff(cat)
        val bin0Ctx = base + (if (numGt1 != 0) 0 else math.min(4, 1 + numEq1))
        val restCtx = base + 5 + math.min(4 - (if (cat == 3) 1 else 0), numGt1)
        val prefix = math.min(absM1, 14)
        if (prefix == 0) e.decision(bin0Ctx, 0)
        else {
          e.decision(bin0Ctx, 1)
          var j = 1
          while (j < prefix) { e.decision(restCtx, 1); j += 1 }
          if (prefix < 14) e.decision(restCtx, 0)
        }
        if (absM1 >= 14) { // EG0 suffix in bypass
          val v = absM1 - 14
          var k = 0
          while (v + 1 >= (2 << k)) { e.bypass(1); k += 1 }
          e.bypass(0)
          var j = k - 1
          val rem = v + 1 - (1 << k)
          while (j >= 0) { e.bypass((rem >> j) & 1); j -= 1 }
        }
        e.bypass(if (zz(idx) < 0) 1 else 0)
        if (level > 1) numGt1 += 1 else numEq1 += 1
      }
      idx -= 1
    }
  }

  /** Encode a one-IDR-frame CABAC Annex-B stream (SPS + PPS + slice).
    * Same Mb descriptions as the CAVLC [[H264Fixture.encodeFrame]];
    * I_PCM not supported. `qpDeltas(addr)` (optional) exercises the
    * mb_qp_delta binarization — only for MBs that carry the element.
    */
  def encodeFrameCabac(mbW: Int, mbH: Int, mbs: Seq[Mb], qp: Int,
                       qpDeltas: Seq[Int] = null): Array[Byte] = {
    require(mbs.length == mbW * mbH)
    require(mbs.forall(m => m.isInstanceOf[I4] || m.isInstanceOf[I16]),
      "I_PCM not encodable under CABAC here")
    val w = new BitWriter
    // slice header (same shape as the CAVLC fixture)
    w.ue(0) // first_mb_in_slice
    w.ue(7) // slice_type: I (all slices in pic)
    w.ue(0) // pic_parameter_set_id
    w.u(0, 4) // frame_num
    w.ue(0) // idr_pic_id
    w.u1(0); w.u1(0) // dec_ref_pic_marking
    w.se(0) // slice_qp_delta
    w.ue(1) // disable_deblocking_filter_idc
    // cabac_alignment_one_bit
    w.byteAlignOnes()
    val e = new Encoder(w, qp)

    // shared (entropy-independent) intra4x4 predicted-mode bookkeeping —
    // identical rule to the CAVLC fixture
    val predModes = Array.fill(mbH * 4, mbW * 4)(-1)
    val blockDone = Array.fill(mbH * 4, mbW * 4)(false)
    var prevDeltaNonZero = false

    mbs.zipWithIndex.foreach { case (mb, addr) =>
      val mbX = addr % mbW
      val mbY = addr / mbW
      def nb(dx: Int, dy: Int): Option[Mb] = {
        val x = mbX + dx; val y = mbY + dy
        if (x < 0 || y < 0) None else Some(mbs(y * mbW + x))
      }

      // ---- mb_type ----
      val typeInc = (if (nb(-1, 0).exists(m => !isI4(m))) 1 else 0) +
        (if (nb(0, -1).exists(m => !isI4(m))) 1 else 0)
      mb match {
        case m: I4 =>
          e.decision(3 + typeInc, 0)
          // 16 pred modes
          var b = 0
          while (b < 16) {
            val (px, py) = H264.Luma4x4Pos(b)
            val bx = mbX * 4 + px / 4
            val by = mbY * 4 + py / 4
            val mA =
              if (bx > 0 && predModes(by)(bx - 1) >= 0) predModes(by)(bx - 1)
              else if (bx > 0 && blockDone(by)(bx - 1)) 2
              else -1
            val mB =
              if (by > 0 && predModes(by - 1)(bx) >= 0) predModes(by - 1)(bx)
              else if (by > 0 && blockDone(by - 1)(bx)) 2
              else -1
            val predicted = if (mA < 0 || mB < 0) 2 else math.min(mA, mB)
            val mode = m.modes(b)
            if (mode == predicted) e.decision(68, 1)
            else {
              e.decision(68, 0)
              val rem = if (mode < predicted) mode else mode - 1
              var i = 0
              while (i < 3) { e.decision(69, (rem >> i) & 1); i += 1 }
            }
            predModes(by)(bx) = mode
            b += 1
          }
        case m: I16 =>
          e.decision(3 + typeInc, 1)
          e.terminate(0) // not I_PCM
          e.decision(6, if (m.ac != null) 1 else 0)
          if (m.cbpChroma == 0) e.decision(7, 0)
          else {
            e.decision(7, 1)
            e.decision(8, if (m.cbpChroma == 2) 1 else 0)
          }
          e.decision(9, (m.predMode >> 1) & 1)
          e.decision(10, m.predMode & 1)
        case _ => sys.error("unreachable")
      }

      // ---- intra_chroma_pred_mode (TU, cMax 3) ----
      val chromaInc = (if (nb(-1, 0).exists(chromaModeOf(_) != 0)) 1 else 0) +
        (if (nb(0, -1).exists(chromaModeOf(_) != 0)) 1 else 0)
      val cm = chromaModeOf(mb)
      if (cm == 0) e.decision(64 + chromaInc, 0)
      else {
        e.decision(64 + chromaInc, 1)
        if (cm == 1) e.decision(67, 0)
        else {
          e.decision(67, 1)
          if (cm == 2) e.decision(67, 0) else e.decision(67, 1)
        }
      }

      // ---- coded_block_pattern (I_4x4 only) ----
      val cbpLuma = cbpLumaOf(mb)
      val cbpChroma = cbpChromaOf(mb)
      if (isI4(mb)) {
        var b = 0
        while (b < 4) {
          val x8 = b & 1
          val y8 = b >> 1
          val condA =
            if (x8 == 1) (if (((cbpLuma >> (b - 1)) & 1) == 0) 1 else 0)
            else nb(-1, 0).map(m => if (((cbpLumaOf(m) >> (1 + 2 * y8)) & 1) == 0) 1 else 0).getOrElse(0)
          val condB =
            if (y8 == 1) (if (((cbpLuma >> (b - 2)) & 1) == 0) 1 else 0)
            else nb(0, -1).map(m => if (((cbpLumaOf(m) >> (2 + x8)) & 1) == 0) 1 else 0).getOrElse(0)
          e.decision(73 + condA + 2 * condB, (cbpLuma >> b) & 1)
          b += 1
        }
        val inc0 = (if (nb(-1, 0).exists(cbpChromaOf(_) != 0)) 1 else 0) +
          2 * (if (nb(0, -1).exists(cbpChromaOf(_) != 0)) 1 else 0)
        if (cbpChroma == 0) e.decision(77 + inc0, 0)
        else {
          e.decision(77 + inc0, 1)
          val inc1 = (if (nb(-1, 0).exists(cbpChromaOf(_) == 2)) 1 else 0) +
            2 * (if (nb(0, -1).exists(cbpChromaOf(_) == 2)) 1 else 0)
          e.decision(81 + inc1, if (cbpChroma == 2) 1 else 0)
        }
      }

      // ---- mb_qp_delta ----
      val cbp = cbpLuma | (cbpChroma << 4)
      val carriesDelta = cbp > 0 || !isI4(mb)
      var deltaNonZero = false
      if (carriesDelta) {
        val delta = if (qpDeltas == null) 0 else qpDeltas(addr)
        deltaNonZero = delta != 0
        val k = if (delta > 0) 2 * delta - 1 else -2 * delta
        var i = 0
        while (i < k) {
          e.decision(if (i == 0) 60 + (if (prevDeltaNonZero) 1 else 0)
            else if (i == 1) 62 else 63, 1)
          i += 1
        }
        e.decision(if (k == 0) 60 + (if (prevDeltaNonZero) 1 else 0)
          else if (k == 1) 62 else 63, 0)
      }
      prevDeltaNonZero = deltaNonZero

      // ---- residuals (decoder request order) ----
      // luma DC cbf neighbors: I_16x16 neighbor's DC cbf; other -> 0;
      // out-of-frame -> 1 (intra rule)
      def dcCond(o: Option[Mb]): Int = o.map(lumaDcCbf).getOrElse(1)
      mb match {
        case m: I16 =>
          writeResidual(e, m.dc, 0, dcCond(nb(-1, 0)), dcCond(nb(0, -1)))
        case _ =>
      }
      // luma 4x4 / AC blocks: neighbor block via global coords
      def lumaCond(bx: Int, by: Int): Int =
        if (bx < 0 || by < 0) 1
        else {
          val nMb = mbs((by / 4) * mbW + bx / 4)
          val lx = (bx % 4) * 4
          val ly = (by % 4) * 4
          val blk = H264.Luma4x4Pos.indexWhere { case (px, py) => px == lx && py == ly }
          lumaCbf(nMb, blk)
        }
      val cat = if (isI4(mb)) 2 else 1
      if (cbpLuma != 0) {
        var b = 0
        while (b < 16) {
          val (px, py) = H264.Luma4x4Pos(b)
          val bx = mbX * 4 + px / 4
          val by = mbY * 4 + py / 4
          if (((cbpLuma >> (b / 4)) & 1) == 1) {
            val zz = mb match {
              case m: I4 => m.blocks(b)
              case m: I16 => m.ac(b)
              case _ => sys.error("unreachable")
            }
            writeResidual(e, zz, cat,
              lumaCond(bx - 1, by), lumaCond(bx, by - 1))
          }
          b += 1
        }
      }
      // chroma DC
      def cDcCond(o: Option[Mb], comp: Int): Int =
        o.map(chromaDcCbf(_, comp)).getOrElse(1)
      if (cbpChroma != 0) {
        val (cbDc, crDc) = mb match {
          case m: I4 => (m.cbDc, m.crDc)
          case m: I16 => (m.cbDc, m.crDc)
          case _ => sys.error("unreachable")
        }
        writeResidual(e, cbDc, 3, cDcCond(nb(-1, 0), 0), cDcCond(nb(0, -1), 0))
        writeResidual(e, crDc, 3, cDcCond(nb(-1, 0), 1), cDcCond(nb(0, -1), 1))
      }
      // chroma AC: neighbor chroma 4x4 via global 2x2-per-MB coords
      def cAcCond(bx: Int, by: Int, comp: Int): Int =
        if (bx < 0 || by < 0) 1
        else chromaAcCbf(mbs((by / 2) * mbW + bx / 2), comp,
          (by % 2) * 2 + (bx % 2))
      if (cbpChroma == 2) {
        var comp = 0
        while (comp < 2) {
          val ac = mb match {
            case m: I4 => if (comp == 0) m.cbAc else m.crAc
            case m: I16 => if (comp == 0) m.cbAc else m.crAc
            case _ => sys.error("unreachable")
          }
          var cbIdx = 0
          while (cbIdx < 4) {
            val bx = mbX * 2 + cbIdx % 2
            val by = mbY * 2 + cbIdx / 2
            writeResidual(e, ac(cbIdx), 4,
              cAcCond(bx - 1, by, comp), cAcCond(bx, by - 1, comp))
            cbIdx += 1
          }
          comp += 1
        }
      }

      // mark decoded blocks for the pred-mode derivation
      var dby = 0
      while (dby < 4) {
        var dbx = 0
        while (dbx < 4) { blockDone(mbY * 4 + dby)(mbX * 4 + dbx) = true; dbx += 1 }
        dby += 1
      }

      // ---- end_of_slice_flag ----
      e.terminate(if (addr == mbs.length - 1) 1 else 0)
    }
    w.byteAlignZeros() // rbsp_alignment_zero_bit after the flush's stop bit
    spsNal(mbW, mbH) ++ ppsNal(qp, cabac = true) ++ nal(5, 3, w.toRbsp)
  }
}
