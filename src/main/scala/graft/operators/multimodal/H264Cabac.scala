package graft.operators.multimodal

import graft.operators.multimodal.H264.{BitReader, BitstreamEnd, MbSyntax}

/** CABAC entropy layer for the [[H264]] baseline-intra decoder (round
  * 15, SURVEY §2 #36c): Main/High-profile streams code I-frames with
  * context-adaptive binary arithmetic coding (spec clause 9.3), not
  * CAVLC — without this layer the decoder yields ZERO keyframes on most
  * real-world corpora. The prediction/transform/dequant machinery is
  * entropy-independent and untouched; this file contributes only the
  * I-slice SYNTAX decode: the arithmetic decoding engine (9.3.3.2), the
  * context model (9.3.1.1/9.3.3.1) and the binarizations (9.3.2) for
  * mb_type, intra pred modes, coded_block_pattern, mb_qp_delta and the
  * residual block (coded_block_flag, significance map, UEG0 levels).
  *
  * Verification honesty (ROUND15_NOTES.md, same discipline as the r14
  * deblocking deferral):
  *  - the ENGINE tables ([[RangeLps]], [[TransIdxLps]]) are transcribed
  *    from the spec and validated in H264CabacSpec against structural
  *    laws from the public CABAC paper (Marpe/Schwarz/Wiegand, IEEE
  *    TCSVT 2003): monotone in both axes, geometric α-decay with
  *    α = (0.01875/0.5)^(1/63), terminal states — a transcription typo
  *    breaks the smoothness bounds;
  *  - the context-INIT constants ([[CtxInit]]) are transcriptions with
  *    no independent offline anchor. The fuzz harness (H264CabacSpec:
  *    randomized frames encoded by the test-side CABAC encoder, decoded
  *    here, reconstruction pinned against H264RefRecon) therefore pins
  *    the engine, the adaptation, every binarization and every
  *    neighbor-context derivation — but not the init constants
  *    themselves. A wrong init constant would affect only FOREIGN
  *    streams, where a probability mismatch makes arithmetic decoding
  *    diverge catastrophically — the realistic failure mode is a bounds
  *    check → degrade-to-None, not wrong pixels.
  *
  * Scope boundaries (degrade to None): I_PCM inside CABAC slices (the
  * 9.3.1.2 engine re-initialization rule), field coding, cabac_init_idc
  * beyond I-slices (P/B inits are not loaded).
  */
private[graft] object H264Cabac {

  // ---------------------------------------------------------------
  // Engine tables (spec Tables 9-44/9-45; structural validation in
  // H264CabacSpec against the public Marpe 2003 derivation)
  // ---------------------------------------------------------------

  /** rangeTabLPS[pStateIdx][(codIRange >> 6) & 3]. */
  val RangeLps: Array[Array[Int]] = Array(
    Array(128, 176, 208, 240), Array(128, 167, 197, 227),
    Array(128, 158, 187, 216), Array(123, 150, 178, 205),
    Array(116, 142, 169, 195), Array(111, 135, 160, 185),
    Array(105, 128, 152, 175), Array(100, 122, 144, 166),
    Array(95, 116, 137, 158), Array(90, 110, 130, 150),
    Array(85, 104, 123, 142), Array(81, 99, 117, 135),
    Array(77, 94, 111, 128), Array(73, 89, 105, 122),
    Array(69, 85, 100, 116), Array(66, 80, 95, 110),
    Array(62, 76, 90, 104), Array(59, 72, 86, 99),
    Array(56, 69, 81, 94), Array(53, 65, 77, 89),
    Array(51, 62, 73, 85), Array(48, 59, 69, 80),
    Array(46, 56, 66, 76), Array(43, 53, 63, 72),
    Array(41, 50, 59, 69), Array(39, 48, 56, 65),
    Array(37, 45, 54, 62), Array(35, 43, 51, 59),
    Array(33, 41, 48, 56), Array(32, 39, 46, 53),
    Array(30, 37, 43, 50), Array(29, 35, 41, 48),
    Array(27, 33, 39, 45), Array(26, 31, 37, 43),
    Array(24, 30, 35, 41), Array(23, 28, 33, 39),
    Array(22, 27, 32, 37), Array(21, 26, 30, 35),
    Array(20, 24, 29, 33), Array(19, 23, 27, 31),
    Array(18, 22, 26, 30), Array(17, 21, 25, 28),
    Array(16, 20, 23, 27), Array(15, 19, 22, 25),
    Array(14, 18, 21, 24), Array(14, 17, 20, 23),
    Array(13, 16, 19, 22), Array(12, 15, 18, 21),
    Array(12, 14, 17, 20), Array(11, 14, 16, 19),
    Array(11, 13, 15, 18), Array(10, 12, 15, 17),
    Array(10, 12, 14, 16), Array(9, 11, 13, 15),
    Array(9, 11, 12, 14), Array(8, 10, 12, 14),
    Array(8, 9, 11, 13), Array(7, 9, 11, 12),
    Array(7, 9, 10, 12), Array(7, 8, 10, 11),
    Array(6, 8, 9, 11), Array(6, 7, 9, 10),
    Array(6, 7, 8, 9), Array(2, 2, 2, 2))

  /** transIdxLPS[pStateIdx] (MPS transition is min(s+1, 62)). */
  val TransIdxLps: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63)

  // ---------------------------------------------------------------
  // Context initialization (m, n) — I-slice column of the spec's init
  // tables, for the contexts an intra-only decode touches. Index =
  // ctxIdx. See the epistemic-status note in the class doc.
  // ---------------------------------------------------------------

  val NumCtx = 276 // 0..275 used here; 276 is the ctx-free terminate

  /** `CtxInit(ctxIdx) = (m, n)`; unused indices hold (0, 0) and are
    * guarded by [[usedCtx]] in the spec.
    */
  val CtxInit: Array[(Int, Int)] = {
    val a = Array.fill(NumCtx)((0, 0))
    def put(from: Int, vs: (Int, Int)*): Unit =
      vs.zipWithIndex.foreach { case (v, i) => a(from + i) = v }
    // mb_type (I), ctx 0..10 (0..2 are the shared mb_skip-ish slot the
    // I-decode never touches but the spec initializes; 3..10 are the
    // I-slice mb_type tree)
    put(0, (20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
      (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51))
    // mb_qp_delta, ctx 60..63
    put(60, (0, 41), (0, 63), (0, 63), (0, 63))
    // intra_chroma_pred_mode, ctx 64..67
    put(64, (-9, 83), (4, 86), (0, 97), (-7, 72))
    // prev_intra4x4_pred_mode_flag (68), rem_intra4x4_pred_mode (69)
    put(68, (13, 41), (3, 62))
    // coded_block_pattern luma, ctx 73..76
    put(73, (-27, 126), (-28, 98), (-25, 101), (-23, 67))
    // coded_block_pattern chroma, ctx 77..84
    put(77, (-28, 82), (-20, 94), (-16, 83), (-22, 110),
      (-21, 91), (-18, 102), (-13, 93), (-29, 127))
    // coded_block_flag, ctx 85..104 (4 per ctxBlockCat 0..4)
    put(85, (-7, 92), (-5, 89), (-7, 96), (-13, 108),
      (-3, 46), (-1, 65), (-1, 57), (-9, 93),
      (-3, 74), (-9, 92), (-8, 87), (-23, 126),
      (5, 54), (6, 60), (6, 59), (6, 69),
      (-1, 48), (0, 68), (-4, 69), (-8, 88))
    // significant_coeff_flag (frame), ctx 105..165
    put(105, (-2, 85), (-6, 78), (-1, 75), (-7, 77), (2, 54), (5, 50),
      (-3, 68), (1, 50), (6, 42), (-4, 81), (1, 63), (-4, 70),
      (0, 67), (2, 57), (-2, 76), (11, 35), (4, 64), (1, 61),
      (11, 35), (18, 25), (12, 24), (13, 29), (13, 36), (-10, 93),
      (-7, 73), (-2, 73), (13, 46), (9, 49), (-7, 100), (9, 53),
      (2, 53), (5, 53), (-2, 61), (0, 56), (0, 56), (-13, 63),
      (-5, 60), (-1, 62), (4, 57), (-6, 69), (4, 57), (14, 39),
      (4, 51), (13, 68), (3, 64), (1, 61), (9, 63), (7, 50),
      (16, 39), (5, 44), (4, 52), (11, 48), (-5, 60), (-1, 59),
      (0, 59), (22, 33), (5, 44), (14, 43), (-1, 78), (0, 60),
      (9, 69))
    // last_significant_coeff_flag (frame), ctx 166..226
    put(166, (11, 28), (2, 40), (3, 44), (0, 49), (0, 46), (2, 44),
      (2, 51), (0, 47), (4, 39), (2, 62), (6, 46), (0, 54),
      (3, 54), (2, 58), (4, 63), (6, 51), (6, 57), (7, 53),
      (6, 52), (6, 55), (11, 45), (14, 36), (8, 53), (-1, 82),
      (7, 55), (-3, 78), (15, 46), (22, 31), (-1, 84), (25, 7),
      (30, -7), (28, 3), (28, 4), (32, 0), (34, -1), (30, 6),
      (30, 6), (32, 9), (31, 19), (26, 27), (26, 30), (37, 20),
      (28, 34), (17, 70), (1, 67), (5, 59), (9, 67), (16, 30),
      (18, 32), (18, 35), (22, 29), (24, 31), (23, 38), (18, 43),
      (20, 41), (11, 63), (9, 59), (9, 64), (-1, 94), (-2, 89),
      (-9, 108))
    // coeff_abs_level_minus1, ctx 227..275 (10 per cat, 9 for cat 3)
    put(227, (-6, 76), (-2, 44), (0, 45), (0, 52), (-3, 64), (-2, 59),
      (-4, 70), (-4, 75), (-8, 82), (-17, 102), (-9, 77), (3, 24),
      (0, 42), (0, 48), (0, 55), (-6, 59), (-7, 71), (-12, 83),
      (-11, 87), (-30, 119), (1, 58), (-3, 29), (-1, 36), (1, 38),
      (2, 43), (-6, 55), (0, 58), (0, 64), (-3, 74), (-10, 90),
      (0, 70), (-4, 29), (5, 31), (7, 42), (1, 59), (-2, 58),
      (-3, 72), (-3, 81), (-11, 97), (0, 58), (8, 5), (10, 14),
      (14, 18), (13, 27), (2, 40), (0, 58), (-3, 70), (-6, 79),
      (-8, 85))
    a
  }

  /** ctxIdx ranges an I-slice decode actually reads (spec'd: every used
    * index must carry a non-placeholder init).
    */
  val usedCtx: Seq[Range] =
    Seq(3 to 10, 60 to 63, 64 to 67, 68 to 69, 73 to 76, 77 to 84,
      85 to 104, 105 to 165, 166 to 226, 227 to 275)

  /** Per-slice context state: 9.3.1.1 initialization from (m, n) and
    * the slice QP. Shared by the decoder here and (by value, with its
    * own adaptation code) the test-side encoder.
    */
  final class CtxState(sliceQp: Int) {
    val pState = new Array[Int](NumCtx)
    val valMps = new Array[Int](NumCtx)
    locally {
      val qp = math.max(0, math.min(51, sliceQp))
      var i = 0
      while (i < NumCtx) {
        val (m, n) = CtxInit(i)
        var pre = ((m * qp) >> 4) + n
        if (pre < 1) pre = 1
        if (pre > 126) pre = 126
        if (pre <= 63) { pState(i) = 63 - pre; valMps(i) = 0 }
        else { pState(i) = pre - 64; valMps(i) = 1 }
        i += 1
      }
    }
  }

  /** The arithmetic decoding engine (9.3.3.2). Bits come from the
    * slice's [[BitReader]]; the final renormalizations of a valid
    * stream may read a few bits past the encoder's flush, so up to 16
    * past-end bits read as 0 before the degrade kicks in.
    */
  final class Decoder(r: BitReader, ctx: CtxState) {
    private var range = 510
    private var offset = 0
    private var pad = 0
    locally {
      var i = 0
      while (i < 9) { offset = (offset << 1) | bit(); i += 1 }
      if (offset >= 510) throw new BitstreamEnd // spec: 510/511 illegal
    }
    private def bit(): Int =
      try r.u1()
      catch {
        case _: BitstreamEnd =>
          pad += 1
          if (pad > 16) throw new BitstreamEnd
          0
      }

    /** DecodeDecision (9.3.3.2.1) + renorm. */
    def decision(ctxIdx: Int): Int = {
      val s = ctx.pState(ctxIdx)
      val rLps = RangeLps(s)((range >> 6) & 3)
      range -= rLps
      var bin = 0
      if (offset >= range) {
        bin = 1 - ctx.valMps(ctxIdx)
        offset -= range
        range = rLps
        if (s == 0) ctx.valMps(ctxIdx) = 1 - ctx.valMps(ctxIdx)
        ctx.pState(ctxIdx) = TransIdxLps(s)
      } else {
        bin = ctx.valMps(ctxIdx)
        ctx.pState(ctxIdx) = if (s < 62) s + 1 else 62
      }
      while (range < 256) {
        range <<= 1
        offset = (offset << 1) | bit()
      }
      bin
    }

    /** DecodeBypass (9.3.3.2.3). */
    def bypass(): Int = {
      offset = (offset << 1) | bit()
      if (offset >= range) { offset -= range; 1 } else 0
    }

    /** DecodeTerminate (9.3.3.2.5): 1 = end of slice / I_PCM escape. */
    def terminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else {
        while (range < 256) {
          range <<= 1
          offset = (offset << 1) | bit()
        }
        0
      }
    }
  }

  // sig/last context offsets per ctxBlockCat (frame-coded 4:2:0)
  private val SigCatOff = Array(0, 15, 29, 44, 47)
  private val AbsCatOff = Array(0, 10, 20, 30, 39)

  /** I-slice MB syntax over the CABAC engine. Owns the CABAC-specific
    * neighbor state: per-MB type/cbp/chroma-mode, the previous MB's
    * mb_qp_delta, and per-block coded_block_flags (9.3.3.1.1.9 —
    * contribution is the decoded cbf where one was coded, 0 where the
    * block carries no residual, 1 outside the frame for intra MBs).
    */
  final class Syntax(r: BitReader, sliceQp: Int, mbW: Int, mbH: Int)
      extends MbSyntax {
    private val ctx = new CtxState(sliceQp)
    private val d = new Decoder(r, ctx)

    // neighbor state (single-slice whole-frame raster: a within-frame
    // left/top neighbor is always already decoded)
    private val mbIsI4x4 = Array.fill(mbH, mbW)(false)
    private val mbChromaMode = Array.fill(mbH, mbW)(0)
    private val mbCbp = Array.fill(mbH, mbW)(0)
    private var prevQpDeltaNonZero = false
    private val cbfLuma = Array.fill(mbH * 4, mbW * 4)(0)
    private val cbfCb = Array.fill(mbH * 2, mbW * 2)(0)
    private val cbfCr = Array.fill(mbH * 2, mbW * 2)(0)
    private val cbfLumaDc = Array.fill(mbH, mbW)(0)
    private val cbfCbDc = Array.fill(mbH, mbW)(0)
    private val cbfCrDc = Array.fill(mbH, mbW)(0)
    // luma DC cbf "present" only for I_16x16 neighbors; chroma DC/AC
    // presence follows the neighbor's cbp — absent blocks contribute 0,
    // which the 0-default grids already encode. I_16x16 vs I_4x4
    // matters only for the luma DC neighbor rule:
    private val mbIsI16 = Array.fill(mbH, mbW)(false)

    def pcmSupported: Boolean = false
    def markPcm(mbX: Int, mbY: Int): Unit =
      throw new BitstreamEnd // unreachable: readMbType rejects I_PCM

    def readMbType(mbX: Int, mbY: Int): Int = {
      // ctxIdxInc (9.3.3.1.1.3): +1 per available neighbor MB whose
      // type is not I_4x4
      var inc = 0
      if (mbX > 0 && !mbIsI4x4(mbY)(mbX - 1)) inc += 1
      if (mbY > 0 && !mbIsI4x4(mbY - 1)(mbX)) inc += 1
      if (d.decision(3 + inc) == 0) return 0 // I_4x4
      if (d.terminate() == 1) return 25      // I_PCM (rejected upstream)
      // I_16x16: cbpLumaFlag, cbpChroma (1-2 bins), predMode (2 bins)
      val cbpLumaFlag = d.decision(6)
      var cbpChroma = 0
      if (d.decision(7) == 1) cbpChroma = if (d.decision(8) == 1) 2 else 1
      val predMode = (d.decision(9) << 1) | d.decision(10)
      1 + predMode + 4 * cbpChroma + 12 * cbpLumaFlag
    }

    def readIntra4x4ModeFlag(): Boolean = d.decision(68) == 1
    def readRemIntra4x4Mode(): Int = {
      // FL, 3 bins, all ctx 69; LSB-first bin order
      var v = 0
      var i = 0
      while (i < 3) { v |= d.decision(69) << i; i += 1 }
      v
    }

    def readChromaPredMode(mbX: Int, mbY: Int): Int = {
      // TU cMax=3; bin0 ctx 64 + inc (neighbors with nonzero chroma
      // mode), bins 1-2 ctx 67
      var inc = 0
      if (mbX > 0 && mbChromaMode(mbY)(mbX - 1) != 0) inc += 1
      if (mbY > 0 && mbChromaMode(mbY - 1)(mbX) != 0) inc += 1
      if (d.decision(64 + inc) == 0) 0
      else if (d.decision(67) == 0) 1
      else if (d.decision(67) == 0) 2
      else 3
    }

    def readCbpI4x4(mbX: Int, mbY: Int): Int = {
      // luma: FL-4, bin b = 8x8 block b; condTermFlagN = 1 when the
      // neighboring 8x8 block's cbp bit is ZERO (available neighbors;
      // out-of-frame contributes 0). Within-MB neighbors use the bins
      // already decoded (9.3.3.1.1.4).
      var cbpLuma = 0
      var b = 0
      while (b < 4) {
        val x8 = b & 1
        val y8 = b >> 1
        val condA =
          if (x8 == 1) (if (((cbpLuma >> (b - 1)) & 1) == 0) 1 else 0)
          else if (mbX > 0) (if (((mbCbp(mbY)(mbX - 1) >> (1 + 2 * y8)) & 1) == 0) 1 else 0)
          else 0
        val condB =
          if (y8 == 1) (if (((cbpLuma >> (b - 2)) & 1) == 0) 1 else 0)
          else if (mbY > 0) (if (((mbCbp(mbY - 1)(mbX) >> (2 + x8)) & 1) == 0) 1 else 0)
          else 0
        if (d.decision(73 + condA + 2 * condB) == 1) cbpLuma |= 1 << b
        b += 1
      }
      // chroma: bin0 (non-zero?) ctx 77 + inc on neighbor cbpChroma != 0;
      // bin1 (== 2?) ctx 81 + inc on neighbor cbpChroma == 2
      def nbChroma(dx: Int, dy: Int): Int = {
        val x = mbX + dx; val y = mbY + dy
        if (x < 0 || y < 0) 0 else (mbCbp(y)(x) >> 4) & 3
      }
      val inc0 = (if (nbChroma(-1, 0) != 0) 1 else 0) +
        2 * (if (nbChroma(0, -1) != 0) 1 else 0)
      var cbpChroma = 0
      if (d.decision(77 + inc0) == 1) {
        val inc1 = (if (nbChroma(-1, 0) == 2) 1 else 0) +
          2 * (if (nbChroma(0, -1) == 2) 1 else 0)
        cbpChroma = if (d.decision(81 + inc1) == 1) 2 else 1
      }
      cbpLuma | (cbpChroma << 4)
    }

    def readQpDelta(): Int = {
      // unary, bin0 ctx 60 + (prev MB's delta != 0), bin1 ctx 62,
      // bins >= 2 ctx 63; then the se()-style signed mapping
      var k = 0
      if (d.decision(60 + (if (prevQpDeltaNonZero) 1 else 0)) == 1) {
        k = 1
        if (d.decision(62) == 1) {
          k = 2
          while (k < 80 && d.decision(63) == 1) k += 1
          if (k >= 80) throw new BitstreamEnd
        }
      }
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }

    /** coded_block_flag ctxIdxInc (9.3.3.1.1.9) given the two
      * neighbor-contribution flags.
      */
    private def cbfCtx(cat: Int, condA: Int, condB: Int): Int =
      85 + 4 * cat + condA + 2 * condB

    def residual(cat: Int, comp: Int, bx: Int, by: Int, mbX: Int, mbY: Int,
                 coded: Boolean, maxCoeff: Int): Array[Int] = {
      val zz = new Array[Int](maxCoeff)
      if (!coded) return zz // no residual → cbf not present → grids stay 0

      // ---- coded_block_flag ----
      val cbf = cat match {
        case 0 =>
          // luma DC: neighbor MB's DC cbf; present only for I_16x16
          // neighbors; out-of-frame → 1 (intra rule)
          val a = if (mbX == 0) 1
            else if (mbIsI16(mbY)(mbX - 1)) cbfLumaDc(mbY)(mbX - 1) else 0
          val b = if (mbY == 0) 1
            else if (mbIsI16(mbY - 1)(mbX)) cbfLumaDc(mbY - 1)(mbX) else 0
          val v = d.decision(cbfCtx(0, a, b))
          cbfLumaDc(mbY)(mbX) = v
          v
        case 1 | 2 =>
          // neighbor 4x4 luma block (shared grid across cat 1/2)
          val a = if (bx == 0) 1 else cbfLuma(by)(bx - 1)
          val b = if (by == 0) 1 else cbfLuma(by - 1)(bx)
          val v = d.decision(cbfCtx(cat, a, b))
          cbfLuma(by)(bx) = v
          v
        case 3 =>
          val g = if (comp == 0) cbfCbDc else cbfCrDc
          val a = if (mbX == 0) 1 else g(mbY)(mbX - 1)
          val b = if (mbY == 0) 1 else g(mbY - 1)(mbX)
          val v = d.decision(cbfCtx(3, a, b))
          g(mbY)(mbX) = v
          v
        case 4 =>
          val g = if (comp == 0) cbfCb else cbfCr
          val a = if (bx == 0) 1 else g(by)(bx - 1)
          val b = if (by == 0) 1 else g(by - 1)(bx)
          val v = d.decision(cbfCtx(4, a, b))
          g(by)(bx) = v
          v
        case _ => throw new BitstreamEnd
      }
      if (cbf == 0) return zz

      // ---- significance map (9.3.3.1.3) ----
      val sig = new Array[Boolean](maxCoeff)
      var last = -1
      var i = 0
      var done = false
      while (!done && i < maxCoeff - 1) {
        if (d.decision(105 + SigCatOff(cat) + i) == 1) {
          sig(i) = true
          last = i
          if (d.decision(166 + SigCatOff(cat) + i) == 1) done = true
        }
        i += 1
      }
      if (!done) { sig(maxCoeff - 1) = true; last = maxCoeff - 1 }

      // ---- levels, highest frequency first (UEG0, uCoff 14) ----
      var numGt1 = 0
      var numEq1 = 0
      var idx = last
      while (idx >= 0) {
        if (sig(idx)) {
          val base = 227 + AbsCatOff(cat)
          val bin0Ctx = base +
            (if (numGt1 != 0) 0 else math.min(4, 1 + numEq1))
          val restCtx = base + 5 +
            math.min(4 - (if (cat == 3) 1 else 0), numGt1)
          var prefix = 0
          if (d.decision(bin0Ctx) == 1) {
            prefix = 1
            while (prefix < 14 && d.decision(restCtx) == 1) prefix += 1
          }
          var absM1 = prefix
          if (prefix == 14) { // EG0 suffix, bypass
            var k = 0
            while (d.bypass() == 1) {
              k += 1
              if (k > 30) throw new BitstreamEnd
            }
            var suffix = 0
            var j = 0
            while (j < k) { suffix = (suffix << 1) | d.bypass(); j += 1 }
            absM1 = 14 + (1 << k) - 1 + suffix
          }
          val level = absM1 + 1
          zz(idx) = if (d.bypass() == 1) -level else level
          if (level > 1) numGt1 += 1 else numEq1 += 1
        }
        idx -= 1
      }
      zz
    }

    def endMb(mbX: Int, mbY: Int, mbType: Int, cbp: Int, chromaMode: Int,
              qpDeltaNonZero: Boolean, lastMb: Boolean): Unit = {
      mbIsI4x4(mbY)(mbX) = mbType == 0
      mbIsI16(mbY)(mbX) = mbType >= 1 && mbType <= 24
      mbChromaMode(mbY)(mbX) = chromaMode
      mbCbp(mbY)(mbX) = cbp
      prevQpDeltaNonZero = qpDeltaNonZero
      // end_of_slice_flag: single-slice whole-frame scope — must be 0
      // before the last MB and 1 on it
      val eos = d.terminate()
      if ((eos == 1) != lastMb) throw new BitstreamEnd
    }
  }
}
