package graft.operators.multimodal

import java.awt.image.BufferedImage

/** Pure-JVM H.264/AVC **baseline intra** decoder — the built-in that
  * closes the compressed-video boundary at the [[FrameDecoder]] seam
  * (SURVEY §2 #36c; reference multimodal surface: dbqt treats video as
  * opaque binary + metadata, this engine decodes real keyframes).
  *
  * Scope (honest boundary, documented in SURVEY §2):
  *  - Annex-B byte streams: start-code NAL parsing with emulation-
  *    prevention removal (spec 7.3/7.4, B.1).
  *  - SPS/PPS for Baseline/Main-style streams: `frame_mbs_only`,
  *    4:2:0, one slice group; BOTH entropy codings — CAVLC (spec 9.2,
  *    in this file) and, since round 15, CABAC (spec 9.3, the
  *    Main/High-profile coding real corpora overwhelmingly use —
  *    [[H264Cabac]], behind the [[MbSyntax]] seam).
  *  - IDR / I slices only: I_4x4, I_16x16 and I_PCM macroblocks
  *    (I_PCM under CAVLC only) with full residual decoding, intra
  *    prediction (8.3.1-8.3.4), dequantization and the integer inverse
  *    transforms (8.5.10-8.5.12). Inter (P/B) slices are NOT decoded:
  *    [[decode]] skips such NAL units, yielding the keyframes — which
  *    is exactly what a frame-sampling training-data pipeline wants
  *    from a video corpus. A full-GOP decoder remains adapter
  *    territory (ffmpeg/JNI) via the same [[FrameDecoder]] seam.
  *
  * The CAVLC code tables (9-5, 9-7/9-9, 9-10) and the CBP mapping
  * (9-4) are transcribed from the published ITU-T H.264 spec;
  * H264Spec structurally validates every VLC table (prefix-free AND
  * Kraft-complete) and pins the worked CAVLC example from the public
  * literature bit-for-bit, then fuzz-roundtrips encoder→decoder over
  * randomized frames (the same pinning discipline as the text
  * kernels).
  *
  * All arithmetic is the spec's exact integer arithmetic — no floats
  * anywhere in the reconstruction path.
  */
object H264 {

  // ---------------------------------------------------------------
  // Bit reader over an RBSP (emulation prevention already removed)
  // ---------------------------------------------------------------

  /** Thrown internally on truncated/invalid input; every public entry
    * catches it and degrades to None (the decode-leg contract).
    * `private[multimodal]` so the CABAC layer ([[H264Cabac]]) shares the
    * same degrade signal.
    */
  private[multimodal] final class BitstreamEnd extends RuntimeException

  final class BitReader(val d: Array[Byte]) {
    private var pos = 0 // bit position
    def bitPos: Int = pos
    def u1(): Int = {
      if ((pos >> 3) >= d.length) throw new BitstreamEnd
      val b = (d(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = v << 1 | u1(); i += 1 }
      v
    }
    /** Exp-Golomb ue(v) (spec 9.1). */
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        if (zeros > 31) throw new BitstreamEnd // corrupt: cap, don't spin
      }
      (1 << zeros) - 1 + (if (zeros == 0) 0 else u(zeros))
    }
    /** Signed Exp-Golomb se(v) (spec 9.1.1). */
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    def byteAlign(): Unit = { pos = (pos + 7) & ~7 }
    def u8Aligned(): Int = { // for PCM samples (stream is aligned there)
      if ((pos & 7) != 0 || (pos >> 3) >= d.length) throw new BitstreamEnd
      val v = d(pos >> 3) & 0xff
      pos += 8
      v
    }
  }

  // ---------------------------------------------------------------
  // NAL layer
  // ---------------------------------------------------------------

  /** Split an Annex-B range into (nal_unit_type, rbsp payload) — start
    * codes 00 00 01 / 00 00 00 01, emulation-prevention 00 00 03 xx
    * unescaped (spec 7.4.1.1).
    */
  def splitNals(d: Array[Byte], start: Int, end: Int): Seq[(Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Int, Array[Byte])]
    // collect start-code positions
    val starts = Seq.newBuilder[Int]
    var i = start
    while (i + 3 <= end) {
      if (d(i) == 0 && d(i + 1) == 0 && d(i + 2) == 1) { starts += i + 3; i += 3 }
      else i += 1
    }
    val ss = starts.result()
    ss.zipWithIndex.foreach { case (s, k) =>
      var e = if (k + 1 < ss.length) ss(k + 1) - 3 else end
      // a 4-byte start code leaves one extra trailing zero before the next
      while (e > s && d(e - 1) == 0 &&
        (k + 1 < ss.length) && e - 1 > s) e -= 1
      if (e > s) {
        val header = d(s) & 0xff
        if ((header & 0x80) == 0) { // forbidden_zero_bit must be 0
          val nalType = header & 0x1f
          // unescape emulation prevention
          val buf = new java.io.ByteArrayOutputStream(e - s)
          var j = s + 1
          var zeros = 0
          while (j < e) {
            val b = d(j) & 0xff
            if (zeros >= 2 && b == 3) { zeros = 0 } // drop the 03
            else {
              buf.write(b)
              zeros = if (b == 0) zeros + 1 else 0
            }
            j += 1
          }
          out += ((nalType, buf.toByteArray))
        }
      }
    }
    out.result()
  }

  // ---------------------------------------------------------------
  // Parameter sets
  // ---------------------------------------------------------------

  final case class Sps(profile: Int, level: Int,
                       log2MaxFrameNum: Int, pocType: Int, log2MaxPocLsb: Int,
                       mbWidth: Int, mbHeight: Int,
                       cropL: Int, cropR: Int, cropT: Int, cropB: Int) {
    def width: Int = mbWidth * 16 - 2 * (cropL + cropR)
    def height: Int = mbHeight * 16 - 2 * (cropT + cropB)
  }

  final case class Pps(picInitQp: Int, chromaQpIndexOffset: Int,
                       deblockingControlPresent: Boolean,
                       cabac: Boolean = false)

  /** Parse an SPS RBSP. None for profiles/features outside the
    * baseline-intra scope (the degrade contract, not an error).
    */
  def parseSps(rbsp: Array[Byte]): Option[Sps] = try {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    r.ue() // seq_parameter_set_id
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
      .contains(profile)) {
      val chromaFormat = r.ue()
      if (chromaFormat != 1) return None // 4:2:0 only
      if (chromaFormat == 3) r.u1()
      r.ue(); r.ue() // bit_depth_{luma,chroma}_minus8
      r.u1() // qpprime_y_zero_transform_bypass_flag
      if (r.u1() == 1) return None // seq_scaling_matrix: out of scope
    }
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    var log2MaxPocLsb = 0
    if (pocType == 0) log2MaxPocLsb = r.ue() + 4
    else if (pocType == 1) return None // full POC machinery: out of scope
    r.ue() // max_num_ref_frames
    r.u1() // gaps_in_frame_num_value_allowed_flag
    val mbW = r.ue() + 1
    val mbHUnits = r.ue() + 1
    val frameMbsOnly = r.u1()
    if (frameMbsOnly != 1) return None // fields/MBAFF: out of scope
    r.u1() // direct_8x8_inference_flag
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (r.u1() == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    // VUI ignored (not needed for raster reconstruction)
    if (mbW <= 0 || mbHUnits <= 0 || mbW > 1024 || mbHUnits > 1024) None
    else Some(Sps(profile, level, log2MaxFrameNum, pocType, log2MaxPocLsb,
      mbW, mbHUnits, cl, cr, ct, cb))
  } catch { case _: BitstreamEnd => None }

  /** Parse a PPS RBSP; None for slice groups (out of scope). CABAC
    * streams are decoded since round 15 (entropy layer in
    * [[H264Cabac]]).
    */
  def parsePps(rbsp: Array[Byte]): Option[Pps] = try {
    val r = new BitReader(rbsp)
    r.ue() // pic_parameter_set_id
    r.ue() // seq_parameter_set_id
    val cabac = r.u1() == 1 // entropy_coding_mode_flag
    r.u1() // bottom_field_pic_order_in_frame_present_flag
    if (r.ue() != 0) return None // num_slice_groups_minus1
    r.ue(); r.ue() // num_ref_idx defaults
    r.u1() // weighted_pred_flag
    r.u(2) // weighted_bipred_idc
    val picInitQp = r.se() + 26
    r.se() // pic_init_qs
    val chromaQpOff = r.se()
    val deblock = r.u1() == 1
    r.u1() // constrained_intra_pred_flag (all-intra: no effect here)
    r.u1() // redundant_pic_cnt_present_flag
    Some(Pps(picInitQp, chromaQpOff, deblock, cabac))
  } catch { case _: BitstreamEnd => None }

  // ---------------------------------------------------------------
  // CAVLC tables (transcribed from ITU-T H.264 Tables 9-5..9-10;
  // H264Spec validates each as a prefix-free Kraft-complete code)
  // ---------------------------------------------------------------

  /** One VLC table: codes("bitstring") = value. Decoding reads bit by
    * bit until a code matches; max length bounds the read.
    */
  final class Vlc(entries: Seq[(String, Int)]) {
    val byCode: Map[String, Int] = entries.toMap
    require(byCode.size == entries.size, "duplicate codeword")
    val maxLen: Int = entries.map(_._1.length).max
    private val lut: Map[(Int, Int), Int] =
      entries.map { case (s, v) => (s.length, Integer.parseInt(s, 2)) -> v }.toMap
    def read(r: BitReader): Int = {
      var len = 0
      var acc = 0
      while (len < maxLen) {
        acc = acc << 1 | r.u1()
        len += 1
        lut.get((len, acc)) match {
          case Some(v) => return v
          case None =>
        }
      }
      throw new BitstreamEnd
    }
    /** Encoder side (tests + table validation): value → bitstring. */
    val byValue: Map[Int, String] = byCode.map(_.swap)
  }

  /** coeff_token value packing: TotalCoeff * 4 + TrailingOnes. */
  @inline def ct(tc: Int, t1: Int): Int = tc * 4 + t1

  /** Table 9-5, column 0 <= nC < 2. */
  val CoeffTokenNc0: Vlc = new Vlc(Seq(
    "1" -> ct(0, 0),
    "000101" -> ct(1, 0), "01" -> ct(1, 1),
    "00000111" -> ct(2, 0), "000100" -> ct(2, 1), "001" -> ct(2, 2),
    "000000111" -> ct(3, 0), "00000110" -> ct(3, 1), "0000101" -> ct(3, 2), "00011" -> ct(3, 3),
    "0000000111" -> ct(4, 0), "000000110" -> ct(4, 1), "00000101" -> ct(4, 2), "000011" -> ct(4, 3),
    "00000000111" -> ct(5, 0), "0000000110" -> ct(5, 1), "000000101" -> ct(5, 2), "0000100" -> ct(5, 3),
    "0000000001111" -> ct(6, 0), "00000000110" -> ct(6, 1), "0000000101" -> ct(6, 2), "00000100" -> ct(6, 3),
    "0000000001011" -> ct(7, 0), "0000000001110" -> ct(7, 1), "00000000101" -> ct(7, 2), "000000100" -> ct(7, 3),
    "0000000001000" -> ct(8, 0), "0000000001010" -> ct(8, 1), "0000000001101" -> ct(8, 2), "0000000100" -> ct(8, 3),
    "00000000001111" -> ct(9, 0), "00000000001110" -> ct(9, 1), "0000000001001" -> ct(9, 2), "00000000100" -> ct(9, 3),
    "00000000001011" -> ct(10, 0), "00000000001010" -> ct(10, 1), "00000000001101" -> ct(10, 2), "0000000001100" -> ct(10, 3),
    "000000000001111" -> ct(11, 0), "000000000001110" -> ct(11, 1), "00000000001001" -> ct(11, 2), "00000000001100" -> ct(11, 3),
    "000000000001011" -> ct(12, 0), "000000000001010" -> ct(12, 1), "000000000001101" -> ct(12, 2), "00000000001000" -> ct(12, 3),
    "0000000000001111" -> ct(13, 0), "000000000000001" -> ct(13, 1), "000000000001001" -> ct(13, 2), "000000000001100" -> ct(13, 3),
    "0000000000001011" -> ct(14, 0), "0000000000001110" -> ct(14, 1), "0000000000001101" -> ct(14, 2), "000000000001000" -> ct(14, 3),
    "0000000000000111" -> ct(15, 0), "0000000000001010" -> ct(15, 1), "0000000000001001" -> ct(15, 2), "0000000000001100" -> ct(15, 3),
    "0000000000000100" -> ct(16, 0), "0000000000000110" -> ct(16, 1), "0000000000000101" -> ct(16, 2), "0000000000001000" -> ct(16, 3)))

  /** Table 9-5, column 2 <= nC < 4. */
  val CoeffTokenNc2: Vlc = new Vlc(Seq(
    "11" -> ct(0, 0),
    "001011" -> ct(1, 0), "10" -> ct(1, 1),
    "000111" -> ct(2, 0), "00111" -> ct(2, 1), "011" -> ct(2, 2),
    "0000111" -> ct(3, 0), "001010" -> ct(3, 1), "001001" -> ct(3, 2), "0101" -> ct(3, 3),
    "00000111" -> ct(4, 0), "000110" -> ct(4, 1), "000101" -> ct(4, 2), "0100" -> ct(4, 3),
    "00000100" -> ct(5, 0), "0000110" -> ct(5, 1), "0000101" -> ct(5, 2), "00110" -> ct(5, 3),
    "000000111" -> ct(6, 0), "00000110" -> ct(6, 1), "00000101" -> ct(6, 2), "001000" -> ct(6, 3),
    "00000001111" -> ct(7, 0), "000000110" -> ct(7, 1), "000000101" -> ct(7, 2), "000100" -> ct(7, 3),
    "00000001011" -> ct(8, 0), "00000001110" -> ct(8, 1), "00000001101" -> ct(8, 2), "0000100" -> ct(8, 3),
    "000000001111" -> ct(9, 0), "00000001010" -> ct(9, 1), "00000001001" -> ct(9, 2), "000000100" -> ct(9, 3),
    "000000001011" -> ct(10, 0), "000000001110" -> ct(10, 1), "000000001101" -> ct(10, 2), "00000001100" -> ct(10, 3),
    "000000001000" -> ct(11, 0), "000000001010" -> ct(11, 1), "000000001001" -> ct(11, 2), "00000001000" -> ct(11, 3),
    "0000000001111" -> ct(12, 0), "0000000001110" -> ct(12, 1), "0000000001101" -> ct(12, 2), "000000001100" -> ct(12, 3),
    "0000000001011" -> ct(13, 0), "0000000001010" -> ct(13, 1), "0000000001001" -> ct(13, 2), "0000000001100" -> ct(13, 3),
    "0000000000111" -> ct(14, 0), "00000000001011" -> ct(14, 1), "0000000000110" -> ct(14, 2), "0000000001000" -> ct(14, 3),
    "00000000001001" -> ct(15, 0), "00000000001000" -> ct(15, 1), "00000000001010" -> ct(15, 2), "0000000000001" -> ct(15, 3),
    "00000000000111" -> ct(16, 0), "00000000000110" -> ct(16, 1), "00000000000101" -> ct(16, 2), "00000000000100" -> ct(16, 3)))

  /** Table 9-5, column 4 <= nC < 8. */
  val CoeffTokenNc4: Vlc = new Vlc(Seq(
    "1111" -> ct(0, 0),
    "001111" -> ct(1, 0), "1110" -> ct(1, 1),
    "001011" -> ct(2, 0), "01111" -> ct(2, 1), "1101" -> ct(2, 2),
    "001000" -> ct(3, 0), "01100" -> ct(3, 1), "01110" -> ct(3, 2), "1100" -> ct(3, 3),
    "0001111" -> ct(4, 0), "01010" -> ct(4, 1), "01011" -> ct(4, 2), "1011" -> ct(4, 3),
    "0001011" -> ct(5, 0), "01000" -> ct(5, 1), "01001" -> ct(5, 2), "1010" -> ct(5, 3),
    "0001001" -> ct(6, 0), "001110" -> ct(6, 1), "001101" -> ct(6, 2), "1001" -> ct(6, 3),
    "0001000" -> ct(7, 0), "001010" -> ct(7, 1), "001001" -> ct(7, 2), "1000" -> ct(7, 3),
    "00001111" -> ct(8, 0), "0001110" -> ct(8, 1), "0001101" -> ct(8, 2), "01101" -> ct(8, 3),
    "00001011" -> ct(9, 0), "00001110" -> ct(9, 1), "0001010" -> ct(9, 2), "001100" -> ct(9, 3),
    "000001111" -> ct(10, 0), "00001010" -> ct(10, 1), "00001101" -> ct(10, 2), "0001100" -> ct(10, 3),
    "000001011" -> ct(11, 0), "000001110" -> ct(11, 1), "00001001" -> ct(11, 2), "00001100" -> ct(11, 3),
    "000001000" -> ct(12, 0), "000001010" -> ct(12, 1), "000001101" -> ct(12, 2), "00001000" -> ct(12, 3),
    "0000001101" -> ct(13, 0), "000000111" -> ct(13, 1), "000001001" -> ct(13, 2), "000001100" -> ct(13, 3),
    "0000001001" -> ct(14, 0), "0000001100" -> ct(14, 1), "0000001011" -> ct(14, 2), "0000001010" -> ct(14, 3),
    "0000000101" -> ct(15, 0), "0000001000" -> ct(15, 1), "0000000111" -> ct(15, 2), "0000000110" -> ct(15, 3),
    "0000000001" -> ct(16, 0), "0000000100" -> ct(16, 1), "0000000011" -> ct(16, 2), "0000000010" -> ct(16, 3)))

  /** Table 9-5, nC == -1 (chroma DC, 4:2:0). */
  val CoeffTokenChromaDc: Vlc = new Vlc(Seq(
    "01" -> ct(0, 0),
    "000111" -> ct(1, 0), "1" -> ct(1, 1),
    "000100" -> ct(2, 0), "000110" -> ct(2, 1), "001" -> ct(2, 2),
    "000011" -> ct(3, 0), "0000011" -> ct(3, 1), "0000010" -> ct(3, 2), "000101" -> ct(3, 3),
    "000010" -> ct(4, 0), "00000011" -> ct(4, 1), "00000010" -> ct(4, 2), "0000000" -> ct(4, 3)))

  /** Tables 9-7/9-8: total_zeros for 4x4 blocks, indexed by
    * TotalCoeff 1..15; inner seq index = totalZeros.
    */
  val TotalZeros4x4: Array[Vlc] = Array(
    null, // index 0 unused (TotalCoeff >= 1)
    new Vlc(Seq("1" -> 0, "011" -> 1, "010" -> 2, "0011" -> 3, "0010" -> 4,
      "00011" -> 5, "00010" -> 6, "000011" -> 7, "000010" -> 8,
      "0000011" -> 9, "0000010" -> 10, "00000011" -> 11, "00000010" -> 12,
      "000000011" -> 13, "000000010" -> 14, "000000001" -> 15)),
    new Vlc(Seq("111" -> 0, "110" -> 1, "101" -> 2, "100" -> 3, "011" -> 4,
      "0101" -> 5, "0100" -> 6, "0011" -> 7, "0010" -> 8, "00011" -> 9,
      "00010" -> 10, "000011" -> 11, "000010" -> 12, "000001" -> 13,
      "000000" -> 14)),
    new Vlc(Seq("0101" -> 0, "111" -> 1, "110" -> 2, "101" -> 3, "0100" -> 4,
      "0011" -> 5, "100" -> 6, "011" -> 7, "0010" -> 8, "00011" -> 9,
      "00010" -> 10, "000001" -> 11, "00001" -> 12, "000000" -> 13)),
    new Vlc(Seq("00011" -> 0, "111" -> 1, "0101" -> 2, "0100" -> 3, "110" -> 4,
      "101" -> 5, "100" -> 6, "0011" -> 7, "011" -> 8, "0010" -> 9,
      "00010" -> 10, "00001" -> 11, "00000" -> 12)),
    new Vlc(Seq("0101" -> 0, "0100" -> 1, "0011" -> 2, "111" -> 3, "110" -> 4,
      "101" -> 5, "100" -> 6, "011" -> 7, "0010" -> 8, "00001" -> 9,
      "0001" -> 10, "00000" -> 11)),
    new Vlc(Seq("000001" -> 0, "00001" -> 1, "111" -> 2, "110" -> 3,
      "101" -> 4, "100" -> 5, "011" -> 6, "010" -> 7, "0001" -> 8,
      "001" -> 9, "000000" -> 10)),
    new Vlc(Seq("000001" -> 0, "00001" -> 1, "101" -> 2, "100" -> 3,
      "011" -> 4, "11" -> 5, "010" -> 6, "0001" -> 7, "001" -> 8,
      "000000" -> 9)),
    new Vlc(Seq("000001" -> 0, "0001" -> 1, "00001" -> 2, "011" -> 3,
      "11" -> 4, "10" -> 5, "010" -> 6, "001" -> 7, "000000" -> 8)),
    new Vlc(Seq("000001" -> 0, "000000" -> 1, "0001" -> 2, "11" -> 3,
      "10" -> 4, "001" -> 5, "01" -> 6, "00001" -> 7)),
    new Vlc(Seq("00001" -> 0, "00000" -> 1, "001" -> 2, "11" -> 3,
      "10" -> 4, "01" -> 5, "0001" -> 6)),
    new Vlc(Seq("0000" -> 0, "0001" -> 1, "001" -> 2, "010" -> 3, "1" -> 4,
      "011" -> 5)),
    new Vlc(Seq("0000" -> 0, "0001" -> 1, "01" -> 2, "1" -> 3, "001" -> 4)),
    new Vlc(Seq("000" -> 0, "001" -> 1, "1" -> 2, "01" -> 3)),
    new Vlc(Seq("00" -> 0, "01" -> 1, "1" -> 2)),
    new Vlc(Seq("0" -> 0, "1" -> 1)))

  /** Table 9-9(a): total_zeros for chroma DC (4:2:0), TotalCoeff 1..3. */
  val TotalZerosChromaDc: Array[Vlc] = Array(
    null,
    new Vlc(Seq("1" -> 0, "01" -> 1, "001" -> 2, "000" -> 3)),
    new Vlc(Seq("1" -> 0, "01" -> 1, "00" -> 2)),
    new Vlc(Seq("1" -> 0, "0" -> 1)))

  /** Table 9-10: run_before, indexed by min(zerosLeft, 7). */
  val RunBefore: Array[Vlc] = Array(
    null,
    new Vlc(Seq("1" -> 0, "0" -> 1)),
    new Vlc(Seq("1" -> 0, "01" -> 1, "00" -> 2)),
    new Vlc(Seq("11" -> 0, "10" -> 1, "01" -> 2, "00" -> 3)),
    new Vlc(Seq("11" -> 0, "10" -> 1, "01" -> 2, "001" -> 3, "000" -> 4)),
    new Vlc(Seq("11" -> 0, "10" -> 1, "011" -> 2, "010" -> 3, "001" -> 4,
      "000" -> 5)),
    new Vlc(Seq("11" -> 0, "000" -> 1, "001" -> 2, "011" -> 3, "010" -> 4,
      "101" -> 5, "100" -> 6)),
    new Vlc(Seq("111" -> 0, "110" -> 1, "101" -> 2, "100" -> 3, "011" -> 4,
      "010" -> 5, "001" -> 6, "0001" -> 7, "00001" -> 8, "000001" -> 9,
      "0000001" -> 10, "00000001" -> 11, "000000001" -> 12,
      "0000000001" -> 13, "00000000001" -> 14)))

  /** Table 9-4 (me(v) for coded_block_pattern), Intra_4x4 column:
    * codeNum -> cbp. A permutation of 0..47 (H264Spec checks).
    */
  val CbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  /** Inverse of [[CbpIntra]] (encoder side). */
  val CbpIntraInv: Array[Int] = {
    val inv = new Array[Int](48)
    var i = 0
    while (i < 48) { inv(CbpIntra(i)) = i; i += 1 }
    inv
  }

  /** Zig-zag scan for 4x4 (spec Table 8-13), index -> raster pos. */
  val Zigzag4x4: Array[Int] = Array(
    0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Dequant scale v (spec Table 8-14 normAdjust4x4 columns), rows
    * m = qP % 6, columns: positions-(0,0)/(2,0)/(0,2)/(2,2), then
    * (1,1)/(1,3)/(3,1)/(3,3), then other.
    */
  val DequantV: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  /** Which v column each raster position uses. */
  val VColumn: Array[Int] = Array(
    0, 2, 0, 2,
    2, 1, 2, 1,
    0, 2, 0, 2,
    2, 1, 2, 1)

  /** Table 8-15: qPc from qPi. */
  val ChromaQpMap: Array[Int] = {
    val m = new Array[Int](52)
    var i = 0
    while (i < 30) { m(i) = i; i += 1 }
    val tail = Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37,
      37, 37, 38, 38, 38, 39, 39, 39, 39)
    tail.zipWithIndex.foreach { case (v, k) => m(30 + k) = v }
    m
  }

  /** luma4x4BlkIdx -> (x, y) sample offset in the MB (spec 6.4.3). */
  val Luma4x4Pos: Array[(Int, Int)] = Array(
    (0, 0), (4, 0), (0, 4), (4, 4), (8, 0), (12, 0), (8, 4), (12, 4),
    (0, 8), (4, 8), (0, 12), (4, 12), (8, 8), (12, 8), (8, 12), (12, 12))

  // ---------------------------------------------------------------
  // Frame decode
  // ---------------------------------------------------------------

  /** Decoded 4:2:0 frame: full-size planes before cropping. Sample
    * values 0..255 stored as Int.
    */
  final case class Frame(sps: Sps, y: Array[Int], cb: Array[Int], cr: Array[Int]) {
    def lumaStride: Int = sps.mbWidth * 16
    def chromaStride: Int = sps.mbWidth * 8
  }

  /** Decode the FIRST IDR/I frame found in an Annex-B access unit.
    * SPS and PPS must be in-band (before the slice). None on any
    * unsupported feature or corruption — degrade, never throw.
    */
  def decodeFrame(data: Array[Byte], start: Int, end: Int): Option[Frame] = try {
    var sps: Option[Sps] = None
    var pps: Option[Pps] = None
    splitNals(data, start, end).foreach {
      case (7, rbsp) => sps = parseSps(rbsp).orElse(sps)
      case (8, rbsp) => pps = parsePps(rbsp).orElse(pps)
      case (5, rbsp) => // IDR slice only: the keyframe-sampling scope
        (sps, pps) match {
          case (Some(s), Some(p)) =>
            val f = decodeSlice(rbsp, s, p)
            if (f.isDefined) return f
          case _ =>
        }
      case _ =>
    }
    None
  } catch { case _: BitstreamEnd | _: ArrayIndexOutOfBoundsException |
                 _: NegativeArraySizeException | _: IllegalArgumentException => None }

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  // ---------------------------------------------------------------
  // Entropy-syntax seam (round 15): the MB-layer SYNTAX differs between
  // CAVLC and CABAC, the reconstruction does not. decodeSlice drives
  // one MB loop against this trait; [[CavlcSyntax]] is the baseline
  // implementation, [[H264Cabac.Syntax]] the Main-profile one. Each
  // implementation owns its OWN neighbor bookkeeping (CAVLC: per-block
  // totalCoeff for nC; CABAC: per-block coded_block_flags, per-MB
  // type/cbp/chroma-mode/qp-delta context).
  // ---------------------------------------------------------------

  /** Residual block categories (spec ctxBlockCat, also used to pick the
    * CAVLC nC rule): 0 Intra16x16DC, 1 Intra16x16AC, 2 Luma4x4,
    * 3 ChromaDC, 4 ChromaAC.
    */
  private[multimodal] trait MbSyntax {
    /** I-slice mb_type (0 I_4x4, 1..24 I_16x16, 25 I_PCM). */
    def readMbType(mbX: Int, mbY: Int): Int
    /** Whether I_PCM macroblocks are decodable in this entropy mode. */
    def pcmSupported: Boolean
    /** Record an I_PCM MB in the neighbor state. */
    def markPcm(mbX: Int, mbY: Int): Unit
    def readIntra4x4ModeFlag(): Boolean
    def readRemIntra4x4Mode(): Int
    def readChromaPredMode(mbX: Int, mbY: Int): Int
    /** coded_block_pattern for an I_4x4 MB (luma | chroma << 4). */
    def readCbpI4x4(mbX: Int, mbY: Int): Int
    def readQpDelta(): Int
    /** One residual block in zigzag order (length maxCoeff). `coded`
      * false = the cbp gates this block off: record the
      * no-residual state and return zeros without consuming bits
      * (CAVLC) / without a coded_block_flag (CABAC). (bx, by) are grid
      * coords in the category's block grid (luma 4x4 / chroma 2x2 per
      * MB); comp selects Cb/Cr for chroma categories.
      */
    def residual(cat: Int, comp: Int, bx: Int, by: Int, mbX: Int, mbY: Int,
                 coded: Boolean, maxCoeff: Int): Array[Int]
    /** End-of-MB hook: neighbor-state updates and (CABAC) the
      * end_of_slice_flag, which must match `lastMb` in the one-slice-
      * per-frame scope.
      */
    def endMb(mbX: Int, mbY: Int, mbType: Int, cbp: Int, chromaMode: Int,
              qpDeltaNonZero: Boolean, lastMb: Boolean): Unit
  }

  /** Baseline CAVLC syntax — the round-14 parse, now behind the seam.
    * Owns the per-block totalCoeff grids that drive nC (9.2.1).
    */
  private final class CavlcSyntax(r: BitReader, mbW: Int, mbH: Int) extends MbSyntax {
    private val lumaNz = Array.fill(mbH * 4, mbW * 4)(-1) // -1 = not yet decoded
    private val cbNz = Array.fill(mbH * 2, mbW * 2)(-1)
    private val crNz = Array.fill(mbH * 2, mbW * 2)(-1)

    private def lumaNC(bx: Int, by: Int): Int = {
      val nA = if (bx > 0) lumaNz(by)(bx - 1) else -1
      val nB = if (by > 0) lumaNz(by - 1)(bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA
      else if (nB >= 0) nB
      else 0
    }
    private def chromaNC(nz: Array[Array[Int]], bx: Int, by: Int): Int = {
      val nA = if (bx > 0) nz(by)(bx - 1) else -1
      val nB = if (by > 0) nz(by - 1)(bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA
      else if (nB >= 0) nB
      else 0
    }

    def readMbType(mbX: Int, mbY: Int): Int = {
      val t = r.ue()
      if (t > 25) throw new BitstreamEnd
      t
    }
    def pcmSupported: Boolean = true
    def markPcm(mbX: Int, mbY: Int): Unit = {
      // nC state: PCM macroblocks count as 16 per block (9.2.1)
      var b = 0
      while (b < 16) {
        val (px, py) = Luma4x4Pos(b)
        lumaNz(mbY * 4 + py / 4)(mbX * 4 + px / 4) = 16
        b += 1
      }
      var cy = 0
      while (cy < 2) {
        var cx = 0
        while (cx < 2) {
          cbNz(mbY * 2 + cy)(mbX * 2 + cx) = 16
          crNz(mbY * 2 + cy)(mbX * 2 + cx) = 16
          cx += 1
        }
        cy += 1
      }
    }
    def readIntra4x4ModeFlag(): Boolean = r.u1() == 1
    def readRemIntra4x4Mode(): Int = r.u(3)
    def readChromaPredMode(mbX: Int, mbY: Int): Int = {
      val m = r.ue()
      if (m > 3) throw new BitstreamEnd
      m
    }
    def readCbpI4x4(mbX: Int, mbY: Int): Int = {
      val code = r.ue()
      if (code > 47) throw new BitstreamEnd
      CbpIntra(code)
    }
    def readQpDelta(): Int = r.se()

    def residual(cat: Int, comp: Int, bx: Int, by: Int, mbX: Int, mbY: Int,
                 coded: Boolean, maxCoeff: Int): Array[Int] = cat match {
      case 0 => // Intra16x16 DC: nC as for luma block 0, no nz record
        residualBlock(lumaNC(bx, by), 16)._1
      case 1 | 2 =>
        if (!coded) { lumaNz(by)(bx) = 0; new Array[Int](maxCoeff) }
        else {
          val (zz, tc) = residualBlock(lumaNC(bx, by), maxCoeff)
          lumaNz(by)(bx) = tc
          zz
        }
      case 3 =>
        if (!coded) new Array[Int](4) else residualBlock(-1, 4)._1
      case 4 =>
        val nz = if (comp == 0) cbNz else crNz
        if (!coded) { nz(by)(bx) = 0; new Array[Int](15) }
        else {
          val (zz, tc) = residualBlock(chromaNC(nz, bx, by), 15)
          nz(by)(bx) = tc
          zz
        }
      case _ => throw new BitstreamEnd
    }

    def endMb(mbX: Int, mbY: Int, mbType: Int, cbp: Int, chromaMode: Int,
              qpDeltaNonZero: Boolean, lastMb: Boolean): Unit = ()

    // ---- CAVLC residual block (9.2) ----
    // returns (coeffLevel in zigzag order, totalCoeff)
    private def residualBlock(nC: Int, maxNumCoeff: Int): (Array[Int], Int) = {
      val tokenVlc =
        if (nC == -1) CoeffTokenChromaDc
        else if (nC < 2) CoeffTokenNc0
        else if (nC < 4) CoeffTokenNc2
        else if (nC < 8) CoeffTokenNc4
        else null
      val token =
        if (tokenVlc != null) tokenVlc.read(r)
        else { // nC >= 8: 6-bit FLC
          val v = r.u(6)
          if (v == 3) ct(0, 0) else ct((v >> 2) + 1, v & 3)
        }
      val totalCoeff = token / 4
      val trailingOnes = token % 4
      val coeffLevel = new Array[Int](maxNumCoeff)
      if (totalCoeff == 0) return (coeffLevel, 0)
      if (totalCoeff > maxNumCoeff) throw new BitstreamEnd
      // levels, highest frequency first
      val levels = new Array[Int](totalCoeff)
      var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
      var i = 0
      while (i < totalCoeff) {
        if (i < trailingOnes) {
          levels(i) = if (r.u1() == 1) -1 else 1
        } else {
          // level_prefix
          var prefix = 0
          while (r.u1() == 0) {
            prefix += 1
            if (prefix > 30) throw new BitstreamEnd
          }
          var suffixSize = suffixLength
          if (prefix == 14 && suffixLength == 0) suffixSize = 4
          else if (prefix >= 15) suffixSize = prefix - 3
          var levelCode = (math.min(15, prefix) << suffixLength)
          if (suffixSize > 0) levelCode += r.u(suffixSize)
          if (prefix >= 15 && suffixLength == 0) levelCode += 15
          if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
          if (i == trailingOnes && trailingOnes < 3) levelCode += 2
          levels(i) =
            if (levelCode % 2 == 0) (levelCode + 2) >> 1
            else -((levelCode + 1) >> 1)
          if (suffixLength == 0) suffixLength = 1
          if (math.abs(levels(i)) > (3 << (suffixLength - 1)) &&
            suffixLength < 6) suffixLength += 1
        }
        i += 1
      }
      // total_zeros
      var zerosLeft = 0
      if (totalCoeff < maxNumCoeff) {
        val tz =
          if (nC == -1) TotalZerosChromaDc(totalCoeff)
          else TotalZeros4x4(totalCoeff)
        zerosLeft = tz.read(r)
      }
      // runs
      var coeffNum = totalCoeff - 1 + zerosLeft
      var k = 0
      while (k < totalCoeff) {
        var runBefore = 0
        if (k < totalCoeff - 1 && zerosLeft > 0)
          runBefore = RunBefore(math.min(zerosLeft, 7)).read(r)
        else if (k == totalCoeff - 1) runBefore = zerosLeft
        if (runBefore > zerosLeft || coeffNum >= maxNumCoeff || coeffNum < 0)
          throw new BitstreamEnd
        coeffLevel(coeffNum) = levels(k)
        zerosLeft -= runBefore
        coeffNum -= runBefore + 1
        k += 1
      }
      (coeffLevel, totalCoeff)
    }
  }

  /** Per-frame decode state and the slice/macroblock layers. */
  private def decodeSlice(rbsp: Array[Byte], sps: Sps,
                          pps: Pps): Option[Frame] = {
    val r = new BitReader(rbsp)
    // ---- slice header (7.3.3), IDR shape ----
    if (r.ue() != 0) return None // first_mb_in_slice: single-slice frames only
    val sliceType = r.ue()
    if (sliceType != 2 && sliceType != 7) return None // I slices only
    r.ue() // pic_parameter_set_id
    r.u(sps.log2MaxFrameNum) // frame_num
    r.ue() // idr_pic_id
    if (sps.pocType == 0) r.u(sps.log2MaxPocLsb) // pic_order_cnt_lsb
    // (bottom_field_poc absent: frame_mbs_only + no field flag in PPS scope)
    // dec_ref_pic_marking, IDR arm (7.3.3.3): IDR NALs have
    // nal_ref_idc != 0, so the two flags are always present
    r.u1() // no_output_of_prior_pics_flag
    r.u1() // long_term_reference_flag
    val sliceQpDelta = r.se()
    var qpY = pps.picInitQp + sliceQpDelta
    if (qpY < 0 || qpY > 51) return None
    if (pps.deblockingControlPresent) {
      val idc = r.ue()
      if (idc != 1) { r.se(); r.se() }
      // NOTE: the in-loop deblocking filter is NOT applied (boundary
      // documented in SURVEY §2 #36c) — streams produced with
      // disable_deblocking_filter_idc == 1 reconstruct exactly.
    }

    val mbW = sps.mbWidth
    val mbH = sps.mbHeight
    val lumaW = mbW * 16
    val chromaW = mbW * 8
    val y = new Array[Int](lumaW * mbH * 16)
    val cb = new Array[Int](chromaW * mbH * 8)
    val cr = new Array[Int](chromaW * mbH * 8)

    // per-4x4-block "decoded" state for intra-pred mode derivation and
    // sample availability (entropy-independent); per-block intra4x4
    // pred modes (-1 for non-I4x4 MBs), for predIntra4x4PredMode
    // derivation (8.3.1.1)
    val blockDecoded = Array.fill(mbH * 4, mbW * 4)(false)
    val predModes = Array.fill(mbH * 4, mbW * 4)(-1)
    // per-MB "is decoded" for intra-pred sample availability
    var curMbAddr = 0

    // the entropy seam: CAVLC inline VLCs, or the CABAC engine
    // (cabac_alignment_one_bit: the slice data starts byte-aligned)
    val syntax: MbSyntax =
      if (pps.cabac) { r.byteAlign(); new H264Cabac.Syntax(r, qpY, mbW, mbH) }
      else new CavlcSyntax(r, mbW, mbH)

    // ---- inverse transforms (8.5.10-8.5.12) ----
    /** In-place 4x4 inverse core transform on raster block d; output
      * residual r = (f + 32) >> 6.
      */
    def inverseTransform4x4(d: Array[Int]): Unit = {
      var i = 0
      while (i < 4) { // rows
        val o = i * 4
        val e0 = d(o) + d(o + 2); val e1 = d(o) - d(o + 2)
        val e2 = (d(o + 1) >> 1) - d(o + 3); val e3 = d(o + 1) + (d(o + 3) >> 1)
        d(o) = e0 + e3; d(o + 1) = e1 + e2; d(o + 2) = e1 - e2; d(o + 3) = e0 - e3
        i += 1
      }
      i = 0
      while (i < 4) { // columns
        val e0 = d(i) + d(i + 8); val e1 = d(i) - d(i + 8)
        val e2 = (d(i + 4) >> 1) - d(i + 12); val e3 = d(i + 4) + (d(i + 12) >> 1)
        d(i) = (e0 + e3 + 32) >> 6; d(i + 4) = (e1 + e2 + 32) >> 6
        d(i + 8) = (e1 - e2 + 32) >> 6; d(i + 12) = (e0 - e3 + 32) >> 6
        i += 1
      }
    }

    /** 4x4 Hadamard (for Intra16x16 luma DC, 8.5.10), no scaling. */
    def hadamard4x4(d: Array[Int]): Unit = {
      var i = 0
      while (i < 4) {
        val o = i * 4
        val e0 = d(o) + d(o + 2); val e1 = d(o) - d(o + 2)
        val e2 = d(o + 1) - d(o + 3); val e3 = d(o + 1) + d(o + 3)
        d(o) = e0 + e3; d(o + 1) = e1 + e2; d(o + 2) = e1 - e2; d(o + 3) = e0 - e3
        i += 1
      }
      i = 0
      while (i < 4) {
        val e0 = d(i) + d(i + 8); val e1 = d(i) - d(i + 8)
        val e2 = d(i + 4) - d(i + 12); val e3 = d(i + 4) + d(i + 12)
        d(i) = e0 + e3; d(i + 4) = e1 + e2; d(i + 8) = e1 - e2; d(i + 12) = e0 - e3
        i += 1
      }
    }

    /** Dequantize a 4x4 AC/residual block in raster order (8.5.12.1;
      * flat scaling lists make the spec's rounding adds exact no-ops,
      * so d = c * v << (qP/6) is bit-identical to the spec formula).
      * `skipDc`: for Intra16x16 AC blocks position 0 carries the
      * separately-scaled DC.
      */
    def dequant4x4(c: Array[Int], qp: Int, skipDc: Boolean): Unit = {
      val m = qp % 6
      val shift = qp / 6
      var i = if (skipDc) 1 else 0
      while (i < 16) {
        c(i) = (c(i) * DequantV(m)(VColumn(i))) << shift
        i += 1
      }
    }

    /** Scale one Intra16x16 luma DC coefficient AFTER the Hadamard
      * (8.5.10): exact spec integer path.
      */
    def scaleLumaDc(f: Int, qp: Int): Int = {
      val v0 = DequantV(qp % 6)(0)
      if (qp >= 12) (f * v0) << (qp / 6 - 2)
      else (f * v0 + (1 << (1 - qp / 6))) >> (2 - qp / 6)
    }

    /** Chroma DC scaling (8.5.11): ((f * 16*v0) << (qP/6)) >> 5. */
    def scaleChromaDc(f: Int, qp: Int): Int =
      ((f * DequantV(qp % 6)(0) * 16) << (qp / 6)) >> 5

    // ---- intra prediction (plane-based neighbor reads) ----
    // sample availability: inside frame AND its MB decoded before the
    // current one (raster order), or same MB and covering 4x4 block
    // earlier in decode order than the current block.
    def sampleAvail(gx: Int, gy: Int, curBlkIdx: Int, mbX: Int, mbY: Int): Boolean = {
      if (gx < 0 || gy < 0 || gx >= lumaW || gy >= mbH * 16) return false
      val sMbX = gx / 16; val sMbY = gy / 16
      val sAddr = sMbY * mbW + sMbX
      if (sAddr < curMbAddr) true
      else if (sAddr > curMbAddr) false
      else {
        // same MB: which 4x4 block covers the sample?
        val lx = gx - mbX * 16; val ly = gy - mbY * 16
        val idx = Luma4x4Pos.indexWhere { case (px, py) =>
          lx >= px && lx < px + 4 && ly >= py && ly < py + 4 }
        idx >= 0 && idx < curBlkIdx
      }
    }

    val frame = Frame(sps, y, cb, cr)

    def reconI4x4Block(plane: Array[Int], stride: Int, gx: Int, gy: Int,
                       mode: Int, resid: Array[Int], qp: Int,
                       blkIdx: Int, mbX: Int, mbY: Int): Unit = {
      // gather neighbors: left l(0..3), top t(0..7), corner tl
      val availLeft = sampleAvail(gx - 1, gy, blkIdx, mbX, mbY)
      val availTop = sampleAvail(gx, gy - 1, blkIdx, mbX, mbY)
      val availTl = sampleAvail(gx - 1, gy - 1, blkIdx, mbX, mbY)
      val t = new Array[Int](8)
      val l = new Array[Int](4)
      var tl = 0
      if (availTop) {
        var i = 0
        while (i < 4) { t(i) = plane((gy - 1) * stride + gx + i); i += 1 }
        // top-right: substitute t(3) when unavailable (8.3.1.2.1)
        val trAvail = sampleAvail(gx + 4, gy - 1, blkIdx, mbX, mbY)
        i = 4
        while (i < 8) {
          t(i) = if (trAvail) plane((gy - 1) * stride + gx + i) else t(3)
          i += 1
        }
      }
      if (availLeft) {
        var i = 0
        while (i < 4) { l(i) = plane((gy + i) * stride + gx - 1); i += 1 }
      }
      if (availTl) tl = plane((gy - 1) * stride + gx - 1)

      val pred = new Array[Int](16)
      mode match {
        case 0 => // vertical
          if (!availTop) throw new BitstreamEnd
          var i = 0
          while (i < 16) { pred(i) = t(i % 4); i += 1 }
        case 1 => // horizontal
          if (!availLeft) throw new BitstreamEnd
          var i = 0
          while (i < 16) { pred(i) = l(i / 4); i += 1 }
        case 2 => // DC
          val v =
            if (availLeft && availTop) (t(0) + t(1) + t(2) + t(3) +
              l(0) + l(1) + l(2) + l(3) + 4) >> 3
            else if (availLeft) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
            else if (availTop) (t(0) + t(1) + t(2) + t(3) + 2) >> 2
            else 128
          java.util.Arrays.fill(pred, v)
        case 3 => // diagonal down-left (8.3.1.2.4)
          if (!availTop) throw new BitstreamEnd
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              pred(yy * 4 + xx) =
                if (xx == 3 && yy == 3) (t(6) + 3 * t(7) + 2) >> 2
                else (t(xx + yy) + 2 * t(xx + yy + 1) + t(xx + yy + 2) + 2) >> 2
              xx += 1
            }
            yy += 1
          }
        case 4 => // diagonal down-right (8.3.1.2.5)
          if (!availTop || !availLeft || !availTl) throw new BitstreamEnd
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              pred(yy * 4 + xx) =
                if (xx > yy)
                  (pAt(xx - yy - 2, -1, t, l, tl) + 2 * pAt(xx - yy - 1, -1, t, l, tl) +
                    pAt(xx - yy, -1, t, l, tl) + 2) >> 2
                else if (xx < yy)
                  (pAt(-1, yy - xx - 2, t, l, tl) + 2 * pAt(-1, yy - xx - 1, t, l, tl) +
                    pAt(-1, yy - xx, t, l, tl) + 2) >> 2
                else (t(0) + 2 * tl + l(0) + 2) >> 2
              xx += 1
            }
            yy += 1
          }
        case 5 => // vertical-right (8.3.1.2.6)
          if (!availTop || !availLeft || !availTl) throw new BitstreamEnd
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              val zVR = 2 * xx - yy
              pred(yy * 4 + xx) =
                if (zVR >= 0 && zVR % 2 == 0)
                  (pAt(xx - (yy >> 1) - 1, -1, t, l, tl) + pAt(xx - (yy >> 1), -1, t, l, tl) + 1) >> 1
                else if (zVR >= 0)
                  (pAt(xx - (yy >> 1) - 2, -1, t, l, tl) + 2 * pAt(xx - (yy >> 1) - 1, -1, t, l, tl) + pAt(xx - (yy >> 1), -1, t, l, tl) + 2) >> 2
                else if (zVR == -1)
                  (l(0) + 2 * tl + t(0) + 2) >> 2
                else // zVR in {-2, -3}: yy - 3 may reach the corner
                  (pAt(-1, yy - 1, t, l, tl) + 2 * pAt(-1, yy - 2, t, l, tl) +
                    pAt(-1, yy - 3, t, l, tl) + 2) >> 2
              xx += 1
            }
            yy += 1
          }
        case 6 => // horizontal-down (8.3.1.2.7)
          if (!availTop || !availLeft || !availTl) throw new BitstreamEnd
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              val zHD = 2 * yy - xx
              pred(yy * 4 + xx) =
                if (zHD >= 0 && zHD % 2 == 0)
                  (pAt(-1, yy - (xx >> 1) - 1, t, l, tl) + pAt(-1, yy - (xx >> 1), t, l, tl) + 1) >> 1
                else if (zHD >= 0)
                  (pAt(-1, yy - (xx >> 1) - 2, t, l, tl) + 2 * pAt(-1, yy - (xx >> 1) - 1, t, l, tl) + pAt(-1, yy - (xx >> 1), t, l, tl) + 2) >> 2
                else if (zHD == -1)
                  (t(0) + 2 * tl + l(0) + 2) >> 2
                else // zHD in {-2, -3}: xx - 3 may reach the corner
                  (pAt(xx - 1, -1, t, l, tl) + 2 * pAt(xx - 2, -1, t, l, tl) +
                    pAt(xx - 3, -1, t, l, tl) + 2) >> 2
              xx += 1
            }
            yy += 1
          }
        case 7 => // vertical-left (8.3.1.2.8)
          if (!availTop) throw new BitstreamEnd
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              pred(yy * 4 + xx) =
                if (yy % 2 == 0)
                  (t(xx + (yy >> 1)) + t(xx + (yy >> 1) + 1) + 1) >> 1
                else
                  (t(xx + (yy >> 1)) + 2 * t(xx + (yy >> 1) + 1) + t(xx + (yy >> 1) + 2) + 2) >> 2
              xx += 1
            }
            yy += 1
          }
        case 8 => // horizontal-up (8.3.1.2.9)
          if (!availLeft) throw new BitstreamEnd
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              val zHU = xx + 2 * yy
              pred(yy * 4 + xx) =
                if (zHU < 5 && zHU % 2 == 0)
                  (l(yy + (xx >> 1)) + l(yy + (xx >> 1) + 1) + 1) >> 1
                else if (zHU < 5)
                  (l(yy + (xx >> 1)) + 2 * l(yy + (xx >> 1) + 1) + l(yy + (xx >> 1) + 2) + 2) >> 2
                else if (zHU == 5)
                  (l(2) + 3 * l(3) + 2) >> 2
                else l(3)
              xx += 1
            }
            yy += 1
          }
        case _ => throw new BitstreamEnd
      }

      // dequant + inverse transform the residual, add, clip, store
      val hasResid = resid.exists(_ != 0)
      if (hasResid) {
        dequant4x4(resid, qp, skipDc = false)
        inverseTransform4x4(resid)
      }
      var i = 0
      while (i < 16) {
        plane((gy + i / 4) * stride + gx + i % 4) =
          clip255(pred(i) + (if (hasResid) resid(i) else 0))
        i += 1
      }
    }

    // p[x, y] accessor for the 4x4 pred formulas (x,y in -1.. space)
    def pAt(x: Int, yv: Int, t: Array[Int], l: Array[Int], tl: Int): Int =
      if (x == -1 && yv == -1) tl
      else if (yv == -1) t(x)
      else l(yv)

    def reconI16x16(plane: Array[Int], stride: Int, gx0: Int, gy0: Int,
                    mode: Int, dc: Array[Int], acBlocks: Array[Array[Int]],
                    qp: Int, mbX: Int, mbY: Int): Unit = {
      val availLeft = mbX > 0
      val availTop = mbY > 0
      val pred = new Array[Int](256)
      mode match {
        case 0 => // vertical
          if (!availTop) throw new BitstreamEnd
          var i = 0
          while (i < 256) {
            pred(i) = plane((gy0 - 1) * stride + gx0 + i % 16); i += 1
          }
        case 1 => // horizontal
          if (!availLeft) throw new BitstreamEnd
          var i = 0
          while (i < 256) {
            pred(i) = plane((gy0 + i / 16) * stride + gx0 - 1); i += 1
          }
        case 2 => // DC
          var sum = 0
          if (availTop && availLeft) {
            var i = 0
            while (i < 16) {
              sum += plane((gy0 - 1) * stride + gx0 + i) +
                plane((gy0 + i) * stride + gx0 - 1)
              i += 1
            }
            sum = (sum + 16) >> 5
          } else if (availTop) {
            var i = 0
            while (i < 16) { sum += plane((gy0 - 1) * stride + gx0 + i); i += 1 }
            sum = (sum + 8) >> 4
          } else if (availLeft) {
            var i = 0
            while (i < 16) { sum += plane((gy0 + i) * stride + gx0 - 1); i += 1 }
            sum = (sum + 8) >> 4
          } else sum = 128
          java.util.Arrays.fill(pred, sum)
        case 3 => // plane (8.3.3.4)
          if (!availTop || !availLeft) throw new BitstreamEnd
          var hSum = 0; var vSum = 0
          var i = 0
          while (i < 8) {
            hSum += (i + 1) * (plane((gy0 - 1) * stride + gx0 + 8 + i) -
              plane((gy0 - 1) * stride + gx0 + 6 - i))
            vSum += (i + 1) * (plane((gy0 + 8 + i) * stride + gx0 - 1) -
              plane((gy0 + 6 - i) * stride + gx0 - 1))
            i += 1
          }
          // i == 7 terms reference p[6-7] = p[-1]: for the top row that
          // is the corner sample at (gx0-1, gy0-1), for the left column
          // the corner at (gx0-1, gy0-1) — both are exactly what the
          // loop's address arithmetic already reads (gx0 + 6 - 7 =
          // gx0 - 1 on row gy0-1; row gy0 + 6 - 7 = gy0 - 1 at column
          // gx0-1), so no special-casing is needed.
          val a = 16 * (plane((gy0 + 15) * stride + gx0 - 1) +
            plane((gy0 - 1) * stride + gx0 + 15))
          val bC = (5 * hSum + 32) >> 6
          val cC = (5 * vSum + 32) >> 6
          var yy = 0
          while (yy < 16) {
            var xx = 0
            while (xx < 16) {
              pred(yy * 16 + xx) =
                clip255((a + bC * (xx - 7) + cC * (yy - 7) + 16) >> 5)
              xx += 1
            }
            yy += 1
          }
        case _ => throw new BitstreamEnd
      }
      // residual: DC raster + per-block AC
      var b = 0
      while (b < 16) {
        val (px, py) = Luma4x4Pos(b)
        val blk = acBlocks(b)
        dequant4x4(blk, qp, skipDc = true)
        // DC sits in raster position 0, from the scaled Hadamard output:
        // dcRaster index = (py/4)*4 + (px/4) in RASTER order of 4x4 blocks
        blk(0) = dc((py / 4) * 4 + (px / 4))
        inverseTransform4x4(blk)
        var i = 0
        while (i < 16) {
          val ox = px + i % 4; val oy = py + i / 4
          plane((gy0 + oy) * stride + gx0 + ox) =
            clip255(pred(oy * 16 + ox) + blk(i))
          i += 1
        }
        b += 1
      }
    }

    def reconChroma(plane: Array[Int], stride: Int, mbX: Int, mbY: Int,
                    mode: Int, dc: Array[Int], acBlocks: Array[Array[Int]],
                    qp: Int, cbpChroma: Int): Unit = {
      val gx0 = mbX * 8; val gy0 = mbY * 8
      val availLeft = mbX > 0
      val availTop = mbY > 0
      val pred = new Array[Int](64)
      mode match {
        case 0 => // DC, per 4x4 sub-block (8.3.4.1)
          var sb = 0
          while (sb < 4) {
            val sx = (sb % 2) * 4; val sy = (sb / 2) * 4
            var v = 128
            val useTop = availTop
            val useLeft = availLeft
            def topSum: Int = {
              var s = 0; var i = 0
              while (i < 4) { s += plane((gy0 - 1) * stride + gx0 + sx + i); i += 1 }
              s
            }
            def leftSum: Int = {
              var s = 0; var i = 0
              while (i < 4) { s += plane((gy0 + sy + i) * stride + gx0 - 1); i += 1 }
              s
            }
            sb match {
              case 0 =>
                if (useTop && useLeft) v = (topSum + leftSum + 4) >> 3
                else if (useTop) v = (topSum + 2) >> 2
                else if (useLeft) v = (leftSum + 2) >> 2
              case 1 => // (4,0): top preferred
                if (useTop) v = (topSum + 2) >> 2
                else if (useLeft) v = (leftSum + 2) >> 2
              case 2 => // (0,4): left preferred
                if (useLeft) v = (leftSum + 2) >> 2
                else if (useTop) v = (topSum + 2) >> 2
              case _ => // (4,4)
                if (useTop && useLeft) v = (topSum + leftSum + 4) >> 3
                else if (useTop) v = (topSum + 2) >> 2
                else if (useLeft) v = (leftSum + 2) >> 2
            }
            var i = 0
            while (i < 16) {
              pred((sy + i / 4) * 8 + sx + i % 4) = v
              i += 1
            }
            sb += 1
          }
        case 1 => // horizontal
          if (!availLeft) throw new BitstreamEnd
          var i = 0
          while (i < 64) {
            pred(i) = plane((gy0 + i / 8) * stride + gx0 - 1); i += 1
          }
        case 2 => // vertical
          if (!availTop) throw new BitstreamEnd
          var i = 0
          while (i < 64) {
            pred(i) = plane((gy0 - 1) * stride + gx0 + i % 8); i += 1
          }
        case 3 => // plane (8.3.4.4)
          if (!availTop || !availLeft) throw new BitstreamEnd
          var hSum = 0; var vSum = 0
          var i = 0
          while (i < 4) {
            val tPlus = plane((gy0 - 1) * stride + gx0 + 4 + i)
            val tMinus =
              if (2 - i >= 0) plane((gy0 - 1) * stride + gx0 + 2 - i)
              else plane((gy0 - 1) * stride + gx0 - 1)
            hSum += (i + 1) * (tPlus - tMinus)
            val lPlus = plane((gy0 + 4 + i) * stride + gx0 - 1)
            val lMinus =
              if (2 - i >= 0) plane((gy0 + 2 - i) * stride + gx0 - 1)
              else plane((gy0 - 1) * stride + gx0 - 1)
            vSum += (i + 1) * (lPlus - lMinus)
            i += 1
          }
          val a = 16 * (plane((gy0 + 7) * stride + gx0 - 1) +
            plane((gy0 - 1) * stride + gx0 + 7))
          val bC = (34 * hSum + 32) >> 6
          val cC = (34 * vSum + 32) >> 6
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              pred(yy * 8 + xx) =
                clip255((a + bC * (xx - 3) + cC * (yy - 3) + 16) >> 5)
              xx += 1
            }
            yy += 1
          }
        case _ => throw new BitstreamEnd
      }
      // residual: 2x2 Hadamard on DC, scale, per-block transform
      val f0 = dc(0) + dc(1) + dc(2) + dc(3)
      val f1 = dc(0) - dc(1) + dc(2) - dc(3)
      val f2 = dc(0) + dc(1) - dc(2) - dc(3)
      val f3 = dc(0) - dc(1) - dc(2) + dc(3)
      val dcScaled = Array(scaleChromaDc(f0, qp), scaleChromaDc(f1, qp),
        scaleChromaDc(f2, qp), scaleChromaDc(f3, qp))
      var sb = 0
      while (sb < 4) {
        val sx = (sb % 2) * 4; val sy = (sb / 2) * 4
        val blk = acBlocks(sb)
        if (cbpChroma == 2) dequant4x4(blk, qp, skipDc = true)
        else java.util.Arrays.fill(blk, 0)
        blk(0) = dcScaled(sb)
        inverseTransform4x4(blk)
        var i = 0
        while (i < 16) {
          val ox = sx + i % 4; val oy = sy + i / 4
          plane((gy0 + oy) * stride + gx0 + ox) =
            clip255(pred(oy * 8 + ox) + blk(i))
          i += 1
        }
        sb += 1
      }
    }


    // ---- the MB loop ----
    var mbAddr = 0
    val mbCount = mbW * mbH
    while (mbAddr < mbCount) {
      curMbAddr = mbAddr
      val mbX = mbAddr % mbW
      val mbY = mbAddr / mbW
      val mbType = syntax.readMbType(mbX, mbY)
      if (mbType > 25) throw new BitstreamEnd
      var qpDeltaNonZero = false
      // per-MB facts for the endMb neighbor bookkeeping (I_PCM infers
      // cbp 15|2<<4 and chroma mode 0 per 7.4.5)
      var mbCbp = 15 | (2 << 4)
      var mbChromaMode = 0

      if (mbType == 25) {
        // ---------- I_PCM (7.3.5, 8.3.5) ----------
        // CABAC I_PCM needs the engine re-initialization rule
        // (9.3.1.2) — out of scope, degrade (ROUND15_NOTES)
        if (!syntax.pcmSupported) throw new BitstreamEnd
        r.byteAlign()
        var i = 0
        while (i < 256) {
          y((mbY * 16 + i / 16) * lumaW + mbX * 16 + i % 16) = r.u8Aligned()
          i += 1
        }
        i = 0
        while (i < 64) {
          cb((mbY * 8 + i / 8) * chromaW + mbX * 8 + i % 8) = r.u8Aligned()
          i += 1
        }
        i = 0
        while (i < 64) {
          cr((mbY * 8 + i / 8) * chromaW + mbX * 8 + i % 8) = r.u8Aligned()
          i += 1
        }
        syntax.markPcm(mbX, mbY)
      } else {
        // ---------- I_4x4 / I_16x16 ----------
        val isI4x4 = mbType == 0
        val i16PredMode = if (isI4x4) -1 else (mbType - 1) % 4
        val i16CbpChroma = if (isI4x4) -1 else ((mbType - 1) / 4) % 3
        val i16CbpLuma = if (isI4x4) -1 else if (mbType - 1 >= 12) 15 else 0

        // -- mb_pred --
        val blockModes = new Array[Int](16)
        if (isI4x4) {
          var b = 0
          while (b < 16) {
            val (px, py) = Luma4x4Pos(b)
            val bx = mbX * 4 + px / 4
            val by = mbY * 4 + py / 4
            // predIntra4x4PredMode (8.3.1.1): min of neighbors, 2 when
            // a neighbor is unavailable or not I4x4-coded
            val mA = if (bx > 0 && predModes(by)(bx - 1) >= 0) predModes(by)(bx - 1)
                     else if (bx > 0 && blockDecoded(by)(bx - 1)) 2 // decoded non-I4x4
                     else -1
            val mB = if (by > 0 && predModes(by - 1)(bx) >= 0) predModes(by - 1)(bx)
                     else if (by > 0 && blockDecoded(by - 1)(bx)) 2
                     else -1
            val predMode =
              if (mA < 0 || mB < 0) 2
              else math.min(mA, mB)
            val mode =
              if (syntax.readIntra4x4ModeFlag()) predMode
              else {
                val rem = syntax.readRemIntra4x4Mode()
                if (rem < predMode) rem else rem + 1
              }
            blockModes(b) = mode
            predModes(by)(bx) = mode
            b += 1
          }
        }
        val chromaPredMode = syntax.readChromaPredMode(mbX, mbY)
        if (chromaPredMode > 3) throw new BitstreamEnd

        // -- coded_block_pattern / mb_qp_delta --
        val cbp =
          if (isI4x4) syntax.readCbpI4x4(mbX, mbY)
          else i16CbpLuma | (i16CbpChroma << 4)
        val cbpLuma = cbp & 15
        val cbpChroma = (cbp >> 4) & 3
        if (cbp > 0 || !isI4x4) {
          // I_16x16 always carries mb_qp_delta (DC residual always coded)
          val delta = syntax.readQpDelta()
          qpDeltaNonZero = delta != 0
          qpY += delta
          if (qpY < 0 || qpY > 51) {
            // spec wraps via modulo; keep simple and strict for our scope
            throw new BitstreamEnd
          }
        }
        val qpC = ChromaQpMap(
          math.max(0, math.min(51, qpY + pps.chromaQpIndexOffset)))

        // -- residuals --
        val lumaBlocks = Array.fill(16)(new Array[Int](16)) // raster per block
        var dcRaster: Array[Int] = null
        if (!isI4x4) {
          // Intra16x16DCLevel (CAVLC: nC as for luma block 0)
          val zz = syntax.residual(0, 0, mbX * 4, mbY * 4, mbX, mbY,
            coded = true, 16)
          // inverse zigzag into raster, Hadamard, then scale
          val d = new Array[Int](16)
          var i = 0
          while (i < 16) { d(Zigzag4x4(i)) = zz(i); i += 1 }
          hadamard4x4(d)
          i = 0
          while (i < 16) { d(i) = scaleLumaDc(d(i), qpY); i += 1 }
          dcRaster = d
        }
        var b = 0
        while (b < 16) {
          val (px, py) = Luma4x4Pos(b)
          val bx = mbX * 4 + px / 4
          val by = mbY * 4 + py / 4
          val coded = ((cbpLuma >> (b / 4)) & 1) == 1
          if (isI4x4) {
            val zz = syntax.residual(2, 0, bx, by, mbX, mbY, coded, 16)
            if (coded) {
              var i = 0
              while (i < 16) { lumaBlocks(b)(Zigzag4x4(i)) = zz(i); i += 1 }
            }
          } else {
            val zz = syntax.residual(1, 0, bx, by, mbX, mbY, coded, 15)
            if (coded) {
              var i = 0
              while (i < 15) { lumaBlocks(b)(Zigzag4x4(i + 1)) = zz(i); i += 1 }
            }
          }
          b += 1
        }
        // chroma DC, then chroma AC
        val cbDc = new Array[Int](4)
        val crDc = new Array[Int](4)
        if (cbpChroma != 0) {
          val zzB = syntax.residual(3, 0, mbX, mbY, mbX, mbY, coded = true, 4)
          val zzR = syntax.residual(3, 1, mbX, mbY, mbX, mbY, coded = true, 4)
          System.arraycopy(zzB, 0, cbDc, 0, 4)
          System.arraycopy(zzR, 0, crDc, 0, 4)
        }
        val chromaBlocks = Array.fill(2, 4)(new Array[Int](16))
        var comp = 0
        while (comp < 2) {
          var cbIdx = 0
          while (cbIdx < 4) {
            val bx = mbX * 2 + cbIdx % 2
            val by = mbY * 2 + cbIdx / 2
            val zz = syntax.residual(4, comp, bx, by, mbX, mbY,
              coded = cbpChroma == 2, 15)
            if (cbpChroma == 2) {
              var i = 0
              while (i < 15) { chromaBlocks(comp)(cbIdx)(Zigzag4x4(i + 1)) = zz(i); i += 1 }
            }
            cbIdx += 1
          }
          comp += 1
        }

        // ---------- reconstruction ----------
        val gx0 = mbX * 16; val gy0 = mbY * 16
        if (isI4x4) {
          var b = 0
          while (b < 16) {
            val (px, py) = Luma4x4Pos(b)
            reconI4x4Block(y, lumaW, gx0 + px, gy0 + py, blockModes(b),
              lumaBlocks(b), qpY, b, mbX, mbY)
            b += 1
          }
        } else {
          reconI16x16(y, lumaW, gx0, gy0, i16PredMode, dcRaster, lumaBlocks,
            qpY, mbX, mbY)
        }
        reconChroma(cb, chromaW, mbX, mbY, chromaPredMode, cbDc,
          chromaBlocks(0), qpC, cbpChroma)
        reconChroma(cr, chromaW, mbX, mbY, chromaPredMode, crDc,
          chromaBlocks(1), qpC, cbpChroma)
        mbCbp = cbp
        mbChromaMode = chromaPredMode
      }
      // entropy-independent decoded state + the entropy impl's own
      // neighbor bookkeeping (CABAC also checks end_of_slice_flag here)
      var dby = 0
      while (dby < 4) {
        var dbx = 0
        while (dbx < 4) { blockDecoded(mbY * 4 + dby)(mbX * 4 + dbx) = true; dbx += 1 }
        dby += 1
      }
      syntax.endMb(mbX, mbY, mbType, mbCbp, mbChromaMode, qpDeltaNonZero,
        mbAddr == mbCount - 1)
      mbAddr += 1
    }

    Some(frame)
  }

  // ---------------------------------------------------------------
  // RGB conversion (full-range BT.601/JFIF, integer) + the adapter
  // ---------------------------------------------------------------

  /** Full-range BT.601 YCbCr -> packed RGB int, the JFIF integer
    * approximation (same matrix the test encoder inverts).
    */
  def yuvToRgb(yv: Int, cbv: Int, crv: Int): Int = {
    val c = crv - 128; val d = cbv - 128
    val r = clip255(yv + ((91881 * c + 32768) >> 16))
    val g = clip255(yv - ((22554 * d + 46802 * c + 32768) >> 16))
    val b = clip255(yv + ((116130 * d + 32768) >> 16))
    r << 16 | g << 8 | b
  }

  /** Frame -> cropped RGB image (nearest-neighbor 4:2:0 upsample). */
  def toImage(f: Frame): BufferedImage = {
    val w = f.sps.width; val h = f.sps.height
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val ls = f.lumaStride; val cs = f.chromaStride
    val ox = f.sps.cropL * 2; val oy = f.sps.cropT * 2
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        val gx = xx + ox; val gy = yy + oy
        img.setRGB(xx, yy, yuvToRgb(
          f.y(gy * ls + gx),
          f.cb((gy / 2) * cs + gx / 2),
          f.cr((gy / 2) * cs + gx / 2)))
        xx += 1
      }
      yy += 1
    }
    img
  }
}

/** The built-in H.264 [[FrameDecoder]]: Annex-B chunks with in-band
  * SPS/PPS (each chunk a self-contained access unit — the layout
  * broadcast/live encoders emit, and the only layout a STATELESS
  * shared decoder instance can handle; out-of-band-extradata streams
  * need a per-payload stateful adapter at the same seam). Inter-coded
  * chunks yield None and are skipped — keyframe sampling, the exact
  * behavior a frame-sampling pipeline wants.
  */
object H264IntraDecoder extends FrameDecoder {
  import AviFrames.VideoFormat
  def supports(fmt: VideoFormat): Boolean =
    fmt.codec == "H264" || fmt.codec == "h264" ||
      fmt.codec == "X264" || fmt.codec == "x264" ||
      fmt.codec == "AVC1" || fmt.codec == "avc1"
  def decode(data: Array[Byte], start: Int, end: Int,
             fmt: VideoFormat): Option[BufferedImage] =
    H264.decodeFrame(data, start, end).map(H264.toImage)
}
