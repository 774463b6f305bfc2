package graft.operators.multimodal

/** Pure-JVM MPEG Audio Layer III (MP3) decoder — the lossy-codec leg of
  * the [[AudioDecoder]] seam (SURVEY §2 #36d; round-16 verdict item #5
  * decided BUILD: every Layer III decode table family has a structural
  * falsifier, retiring the round-15 "unfalsifiable-by-construction"
  * deferral — see ROUND16_NOTES.md). Written from the public ISO
  * 11172-3 (MPEG-1) / ISO 13818-3 (MPEG-2 LSF) bitstream layouts, not
  * from any decoder's source.
  *
  * Coverage: MPEG-1 and MPEG-2 (LSF) Layer III; mono/stereo/dual; MS
  * stereo; long/short/start/stop and mixed blocks; the bit reservoir;
  * scfsi; intensity stereo for MPEG-1 (LSF intensity degrades — see
  * boundaries). Frames decode through the full chain: side info →
  * scalefactors → Huffman → requantize → reorder → stereo → alias
  * reduction → IMDCT + overlap-add → frequency inversion → 32-band
  * polyphase synthesis.
  *
  * == Epistemic status, per table family (the round-15/16 discipline) ==
  *
  *  - '''Huffman code tables''': each transcribed table is pinned by
  *    the exact-completeness law (Kraft sum == 1) + prefix-freeness +
  *    pair uniqueness (Mp3Spec) — a wrong code LENGTH is detected with
  *    certainty, a wrong code VALUE almost surely collides. The
  *    value-trusted set is tables 0-3, 5-12 and both count1 tables:
  *    those transcriptions are genuine and survived the structural
  *    pins on first contact (one forced single-entry repair in table
  *    9, where the two free leaves uniquely determined the fix). The
  *    16x16 tables (13, 15, and the linbits families 16-23/24-31)
  *    are NOT carried: a value-level transcription of ~1000 further
  *    entries was not available to this round with integrity, and a
  *    fabricated table would decode foreign streams to
  *    wrong-but-plausible samples — the exact silent failure the
  *    round-15 MP3 deferral existed to avoid. A frame that selects an
  *    uncarried table degrades the payload to None — '''loud, never
  *    wrong'''. Upgrade path (the CtxInit move): an independently
  *    retrieved public copy of ISO Table B.7's big tables drops into
  *    [[Mp3Tables.BigValue]] and the engine needs no other change
  *    (the escape/linbits path is already fuzz-exercised through
  *    clearly-marked synthetic surrogate tables in Mp3Spec).
  *  - '''Scalefactor-band tables''': monotone, 0-start, 576/192-end,
  *    width-growth pins in Mp3Spec (the one family the round-16 note
  *    grades weak-moderate: a monotone-preserving interior swap would
  *    pass — residual risk documented there).
  *  - '''Synthesis window''': NOT the ISO Table 3-B.3 transcription
  *    (512 empirical reals — same integrity bar as the big Huffman
  *    tables). Instead the polyphase stage runs a canonical
  *    pseudo-QMF cosine-modulated bank (phases (2k+1)(n-255.5)pi/64
  *    -/+ (-1)^k pi/4) over [[Mp3Synthesis.Window]], a 512-tap
  *    symmetric prototype designed in-repo for the near-perfect-
  *    reconstruction law (Nyquist-64 autocorrelation + stopband
  *    minimization). The law is the falsifier the round-16
  *    feasibility note predicted: analysis->synthesis round-trips at
  *    ~95 dB SNR and a single 1e-3 tap perturbation collapses it to
  *    ~44 dB (Mp3Spec asserts both directions). Consequence for
  *    foreign streams: the subband-domain phase convention differs
  *    from ISO's C/D tables by a per-band rotation, so a foreign
  *    non-silent stream would reconstruct with per-band phase shifts
  *    — band ENERGIES (everything [[BinaryPipeline.audioEmbedding]]
  *    consumes) are invariant to that rotation. The one foreign
  *    anchor available on this machine (a real LAME-encoded MPEG-2
  *    LSF stream, digital silence) exercises framing, LSF side info,
  *    the reservoir fields and the zero-spectrum DSP path end-to-end
  *    and is asserted in Mp3Spec.
  *  - '''Everything else is closed-form''': requantization gains
  *    (2^x), IMDCT windows (sine shapes from the spec formulas),
  *    alias-reduction cs/ca (derived from the 8 published ci via
  *    1/sqrt(1+c^2) — magnitude-decay pinned), slen pairs and the
  *    LSF scalefac_compress decomposition (count-sum laws pinned).
  *
  * Boundaries (degrade to None, documented): MPEG-2.5; free-format
  * bitrate; LSF intensity stereo; frames selecting uncarried Huffman
  * tables. Failure contract as everywhere in this package: malformed /
  * truncated payloads degrade to None, never throw ([[decode]] wraps
  * the walk; corruption-fuzzed in Mp3Spec).
  */
object Mp3Decoder extends AudioDecoder {

  private final class Malformed extends RuntimeException
  /** A frame selected a Huffman table outside the value-trusted set —
    * decodable only wrongly, so the payload degrades loudly.
    */
  private final class UncarriedTable extends RuntimeException

  // ---------------------------------------------------------------
  // Bit reader over a byte array window. Reads past `endBit` return 0
  // and set `overran` (Layer III main data is deliberately read
  // against a bit budget; the overrun flag drives count1 rollback).
  // ---------------------------------------------------------------
  private[graft] final class Bits(d: Array[Byte], var pos: Long, val endBit: Long) {
    var overran = false
    def u1(): Int = {
      if (pos >= endBit) { overran = true; pos += 1; 0 }
      else {
        val b = (d((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1
        pos += 1
        b
      }
    }
    def u(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | u1(); i += 1 }; v }
  }

  // ---------------------------------------------------------------
  // Huffman tables (ISO 11172-3 Table B.7, value-trusted subset).
  // ---------------------------------------------------------------
  private[graft] final class HuffTable(val ylen: Int, val lens: Array[Int],
                                       val codes: Array[Int], val linbits: Int)
      extends Serializable {
    // binary trie: node i has children at child(2i), child(2i+1);
    // leaf payload stored as -(entry index + 2), -1 = absent
    private val child: Array[Int] = {
      val buf = scala.collection.mutable.ArrayBuffer(-1, -1)
      for (e <- lens.indices) {
        var node = 0
        var bit = lens(e) - 1
        while (bit >= 0) {
          val slot = 2 * node + ((codes(e) >> bit) & 1)
          if (bit == 0) {
            require(buf(slot) == -1, s"code collision at entry $e")
            buf(slot) = -(e + 2)
          } else {
            if (buf(slot) == -1) { buf(slot) = buf.length / 2; buf += -1; buf += -1 }
            node = buf(slot)
            require(node > 0, s"prefix collision at entry $e")
          }
          bit -= 1
        }
      }
      buf.toArray
    }
    require(!child.contains(-1), "incomplete code (Kraft sum < 1)")

    /** Decoded entry index (x*ylen + y for pair tables), or Malformed
      * on a walk that cannot terminate (corrupt reservoir).
      */
    def decode(b: Bits): Int = {
      var node = 0
      var depth = 0
      while (depth < 24) {
        val c = child(2 * node + b.u1())
        if (c <= -2) return -c - 2
        node = c
        depth += 1
      }
      throw new Malformed
    }
  }

  private[graft] object Mp3Tables {
    private def t(ylen: Int, linbits: Int, lens: Array[Int], codes: Array[Int]) =
      new HuffTable(ylen, lens, codes, linbits)

    // Pair tables, row-major in x. Structural pins: Mp3Spec re-asserts
    // Kraft completeness/prefix-freeness from an independent checker
    // (the HuffTable constructor itself refuses inconsistent tables).
    val T1 = t(2, 0, Array(1,3,2,3), Array(1,1,1,0))
    val T2 = t(3, 0, Array(1,3,6, 3,3,5, 5,5,6), Array(1,2,1, 3,1,1, 3,2,0))
    val T3 = t(3, 0, Array(2,2,6, 3,2,5, 5,5,6), Array(3,2,1, 1,1,1, 3,2,0))
    val T5 = t(4, 0, Array(1,3,6,7, 3,3,6,7, 6,6,7,8, 7,6,7,8),
                     Array(1,2,6,5, 3,1,4,4, 7,5,7,1, 6,1,1,0))
    val T6 = t(4, 0, Array(3,3,5,7, 3,2,4,5, 4,4,5,6, 6,5,6,7),
                     Array(7,3,5,1, 6,2,3,2, 5,4,4,1, 3,3,2,0))
    val T7 = t(6, 0,
      Array(1,3,6,8,8,9, 3,4,6,7,7,8, 6,5,7,8,8,9, 7,7,8,9,9,9, 7,7,8,9,9,10, 8,8,9,10,10,10),
      Array(1,2,10,19,16,10, 3,3,7,10,5,3, 11,4,13,17,8,4, 12,11,18,15,11,2, 7,6,9,14,3,1, 6,4,5,3,2,0))
    val T8 = t(6, 0,
      Array(2,3,6,8,8,9, 3,2,4,8,8,8, 6,4,6,8,8,9, 8,8,8,9,9,10, 8,7,8,9,10,10, 9,8,9,9,11,11),
      Array(3,4,6,18,12,5, 5,1,2,16,9,3, 7,3,5,14,7,3, 19,17,15,13,10,4, 13,5,8,11,5,1, 12,4,4,1,1,0))
    val T9 = t(6, 0,
      Array(3,3,5,6,8,9, 3,3,4,5,6,8, 4,4,5,6,7,8, 6,5,6,7,7,8, 7,6,7,7,8,9, 8,7,8,8,9,9),
      Array(7,5,9,14,15,7, 6,4,5,5,6,7, 7,6,8,8,8,5, 15,6,9,10,5,1, 11,7,9,6,4,1, 14,4,6,2,6,0))
    val T10 = t(8, 0,
      Array(1,3,6,8,9,9,9,10, 3,4,6,7,8,9,8,8, 6,6,7,8,9,10,9,9, 7,7,8,9,10,10,9,10,
            8,8,9,10,10,10,10,10, 9,9,10,10,11,11,10,11, 8,8,9,10,10,10,11,11, 9,8,9,10,10,11,11,11),
      Array(1,2,10,23,35,30,12,17, 3,3,8,12,18,21,12,7, 11,9,15,21,32,40,19,6, 14,13,22,34,46,23,18,7,
            20,19,33,47,27,22,9,3, 31,22,41,26,21,20,5,3, 14,13,10,11,16,6,5,1, 9,8,7,8,4,4,2,0))
    val T11 = t(8, 0,
      Array(2,3,5,7,8,9,8,9, 3,3,4,6,8,8,7,8, 5,5,6,7,8,9,8,8, 7,6,7,9,8,10,8,9,
            8,8,8,9,9,10,9,10, 8,8,9,10,10,11,10,11, 8,7,7,8,9,10,10,10, 8,7,8,9,10,10,10,10),
      Array(3,4,10,24,34,33,21,15, 5,3,4,10,32,17,11,10, 11,7,13,18,30,31,20,5, 25,11,19,59,27,18,12,5,
            35,33,31,58,30,16,7,5, 28,26,32,19,17,15,8,14, 14,12,9,13,14,9,4,1, 11,4,6,6,6,3,2,0))
    val T12 = t(8, 0,
      Array(4,3,5,7,8,9,9,9, 3,3,4,5,7,7,8,8, 5,4,5,6,7,8,7,8, 6,5,6,6,7,8,8,8,
            7,6,7,7,8,8,8,9, 8,7,8,8,8,9,8,9, 8,7,7,8,8,9,9,10, 9,8,8,9,9,9,9,10),
      Array(9,6,16,33,41,39,38,26, 7,5,6,9,23,16,26,11, 17,7,11,14,21,30,10,7, 17,10,15,12,18,28,14,5,
            32,13,22,19,18,16,9,5, 40,17,31,29,17,13,4,2, 27,12,11,15,10,7,4,1, 27,12,8,12,6,3,1,0))

    /** count1 quadruple tables (leaf payload = v*8+w*4+x*2+y). */
    val Count1A = t(1, 0,
      Array(1,4,4,5,4,6,5,6,4,5,5,6,5,6,6,6),
      Array(1,5,4,5,6,5,4,4,7,3,6,0,7,2,3,1))
    val Count1B = t(1, 0, Array.fill(16)(4), Array.tabulate(16)(15 - _))

    /** linbits for the two escape families — trusted spec structure
      * even though their code tables are not carried (the mapping is
      * needed by the surrogate-table fuzz and by a future retrieval).
      */
    val Linbits16: Array[Int] = Array(1, 2, 3, 4, 6, 8, 10, 13) // tables 16-23
    val Linbits24: Array[Int] = Array(4, 5, 6, 7, 8, 9, 11, 13) // tables 24-31

    /** Big-value table slots 0-31: null = uncarried (13, 15, 16-31)
      * or reserved (4, 14). Slot 0 is the no-bits all-zero table,
      * handled structurally in the spectral reader.
      */
    val BigValue: Array[HuffTable] = {
      val a = new Array[HuffTable](32)
      a(1) = T1; a(2) = T2; a(3) = T3; a(5) = T5; a(6) = T6; a(7) = T7
      a(8) = T8; a(9) = T9; a(10) = T10; a(11) = T11; a(12) = T12
      a
    }
  }

  // ---------------------------------------------------------------
  // Scalefactor-band tables. MPEG-1 (ISO 11172-3 Table B.8) by sample
  // rate 44100/48000/32000; LSF (ISO 13818-3) by 22050/24000/16000.
  // Pins in Mp3Spec: 0-start, 576/192-end, strictly increasing,
  // non-decreasing widths (final short LSF band excepted — the
  // remainder band at the Nyquist tail is narrower by construction).
  // ---------------------------------------------------------------
  private[graft] val SfbLong: Array[Array[Int]] = Array(
    Array(0,4,8,12,16,20,24,30,36,44,52,62,74,90,110,134,162,196,238,288,342,418,576),
    Array(0,4,8,12,16,20,24,30,36,42,50,60,72,88,106,128,156,190,230,276,330,384,576),
    Array(0,4,8,12,16,20,24,30,36,44,54,66,84,106,136,170,212,264,322,388,464,540,576))
  private[graft] val SfbShort: Array[Array[Int]] = Array(
    Array(0,4,8,12,16,22,30,40,52,66,84,106,136,192),
    Array(0,4,8,12,16,22,28,38,50,64,80,100,126,192),
    Array(0,4,8,12,16,22,30,42,58,78,104,138,180,192))
  private[graft] val SfbLongLsf: Array[Array[Int]] = Array(
    Array(0,6,12,18,24,30,36,44,54,66,80,96,116,140,168,200,238,284,336,396,464,522,576),
    Array(0,6,12,18,24,30,36,42,50,60,72,88,106,128,152,180,216,256,302,358,420,478,576),
    Array(0,6,12,18,24,30,36,44,54,66,80,96,116,140,168,200,238,284,336,396,464,522,576))
  private[graft] val SfbShortLsf: Array[Array[Int]] = Array(
    Array(0,4,8,12,18,24,32,42,56,74,100,132,174,192),
    Array(0,4,8,12,18,26,36,48,62,80,104,136,180,192),
    Array(0,4,8,12,18,26,36,48,62,80,104,134,174,192))

  /** Pre-emphasis table (long bands, applied under preflag). */
  private[graft] val Pretab: Array[Int] =
    Array(0,0,0,0,0,0,0,0,0,0,0,1,1,1,1,2,2,3,3,3,2,0)

  /** slen1/slen2 pairs for MPEG-1 scalefac_compress 0-15. */
  private[graft] val Slen: Array[(Int, Int)] = Array(
    (0,0),(0,1),(0,2),(0,3),(3,0),(1,1),(1,2),(1,3),
    (2,1),(2,2),(2,3),(3,1),(3,2),(3,3),(4,2),(4,3))

  /** LSF scalefactor group sizes, [scBlock][winKind(0=long,1=short,2=mixed)]. */
  private[graft] val LsfNrSfb: Array[Array[Array[Int]]] = Array(
    Array(Array(6,5,5,5), Array(9,9,9,9), Array(6,9,9,9)),
    Array(Array(6,5,7,3), Array(9,9,12,6), Array(6,9,12,6)),
    Array(Array(11,10,0,0), Array(18,18,0,0), Array(15,18,0,0)))

  /** Alias-reduction butterflies: the 8 published ci; cs/ca derived. */
  private[graft] val AliasCi: Array[Double] =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  private val AliasCs = AliasCi.map(c => 1.0 / math.sqrt(1.0 + c * c))
  private val AliasCa = AliasCi.map(c => c / math.sqrt(1.0 + c * c))

  // ---------------------------------------------------------------
  // Header / side info
  // ---------------------------------------------------------------
  private val BitrateV1 = Array(0,32,40,48,56,64,80,96,112,128,160,192,224,256,320,0)
  private val BitrateV2 = Array(0,8,16,24,32,40,48,56,64,80,96,112,128,144,160,0)
  private val RatesV1 = Array(44100, 48000, 32000)
  private val RatesV2 = Array(22050, 24000, 16000)

  private final class Header {
    var lsf = false          // MPEG-2 low-sample-frequency
    var srIdx = 0            // 0..2 within the version's rate family
    var bitrate = 0          // kbps
    var crc = false
    var mode = 0             // 0 stereo, 1 joint, 2 dual, 3 mono
    var modeExt = 0
    var frameLen = 0
    def channels: Int = if (mode == 3) 1 else 2
    def sampleRate: Int = if (lsf) RatesV2(srIdx) else RatesV1(srIdx)
  }

  /** Parse the 4-byte header at `off`; None if not a valid
    * MPEG-1/2 Layer III header this decoder carries. Total.
    */
  private def parseHeader(d: Array[Byte], off: Int): Option[Header] = {
    if (off + 4 > d.length) return None
    val b1 = d(off) & 0xFF; val b2 = d(off + 1) & 0xFF
    val b3 = d(off + 2) & 0xFF; val b4 = d(off + 3) & 0xFF
    if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) return None
    val ver = (b2 >> 3) & 3     // 3=MPEG1, 2=MPEG2, 0=MPEG2.5 (uncarried)
    val layer = (b2 >> 1) & 3   // 1 = Layer III
    if ((ver != 3 && ver != 2) || layer != 1) return None
    val bri = (b3 >> 4) & 15
    val sri = (b3 >> 2) & 3
    if (bri == 0 || bri == 15 || sri == 3) return None // free-format uncarried
    val h = new Header
    h.lsf = ver == 2
    h.srIdx = sri
    h.bitrate = if (h.lsf) BitrateV2(bri) else BitrateV1(bri)
    h.crc = (b2 & 1) == 0
    h.mode = (b4 >> 6) & 3
    h.modeExt = (b4 >> 4) & 3
    val pad = (b3 >> 1) & 1
    val factor = if (h.lsf) 72000 else 144000
    h.frameLen = factor * h.bitrate / h.sampleRate + pad
    if (h.frameLen < 24) return None
    Some(h)
  }

  /** ID3v2 skip; returns the first post-tag offset. Total. The flags
    * byte's 0x10 bit declares an ID3v2.4 footer — 10 more bytes after
    * the tag body that would otherwise land the sync scan on '3DI'
    * (review-r16).
    */
  private def skipId3(d: Array[Byte]): Int =
    if (d.length >= 10 && d(0) == 'I' && d(1) == 'D' && d(2) == '3') {
      val sz = ((d(6) & 0x7F) << 21) | ((d(7) & 0x7F) << 14) | ((d(8) & 0x7F) << 7) | (d(9) & 0x7F)
      val footer = if ((d(5) & 0x10) != 0) 10 else 0
      val off = 10L + sz + footer
      if (off < d.length) off.toInt else d.length
    } else 0

  private final class GrInfo {
    var part23 = 0; var bigValues = 0; var globalGain = 0; var sfCompress = 0
    var windowSwitching = false; var blockType = 0; var mixed = false
    val tableSelect = new Array[Int](3)
    val subblockGain = new Array[Int](3)
    var region0 = 0; var region1 = 0
    var preflag = false; var sfScale = 0; var count1Sel = 0
  }

  private final class SideInfo(granules: Int, channels: Int) {
    var mainDataBegin = 0
    val scfsi = Array.ofDim[Int](channels, 4)
    val gr = Array.fill(granules, channels)(new GrInfo)
  }

  private def parseSideInfo(b: Bits, h: Header): SideInfo = {
    val nGr = if (h.lsf) 1 else 2
    val ch = h.channels
    val si = new SideInfo(nGr, ch)
    si.mainDataBegin = b.u(if (h.lsf) 8 else 9)
    b.u(if (h.lsf) { if (ch == 1) 1 else 2 } else { if (ch == 1) 5 else 3 }) // private bits
    if (!h.lsf) for (c <- 0 until ch; g <- 0 until 4) si.scfsi(c)(g) = b.u1()
    for (g <- 0 until nGr; c <- 0 until ch) {
      val gi = si.gr(g)(c)
      gi.part23 = b.u(12)
      gi.bigValues = b.u(9)
      gi.globalGain = b.u(8)
      gi.sfCompress = b.u(if (h.lsf) 9 else 4)
      gi.windowSwitching = b.u1() == 1
      if (gi.windowSwitching) {
        gi.blockType = b.u(2)
        gi.mixed = b.u1() == 1
        gi.tableSelect(0) = b.u(5); gi.tableSelect(1) = b.u(5)
        gi.subblockGain(0) = b.u(3); gi.subblockGain(1) = b.u(3); gi.subblockGain(2) = b.u(3)
        if (gi.blockType == 0) throw new Malformed // forbidden combination
        // two transmitted regions; boundaries fixed at 36/576
        gi.region0 = 7; gi.region1 = 13
      } else {
        gi.blockType = 0
        gi.tableSelect(0) = b.u(5); gi.tableSelect(1) = b.u(5); gi.tableSelect(2) = b.u(5)
        gi.region0 = b.u(4); gi.region1 = b.u(3)
      }
      if (!h.lsf) gi.preflag = b.u1() == 1
      gi.sfScale = b.u1()
      gi.count1Sel = b.u1()
      if (gi.bigValues > 288) throw new Malformed
    }
    si
  }

  // ---------------------------------------------------------------
  // Scalefactors
  // ---------------------------------------------------------------
  private final class Scalefacs {
    val long = new Array[Int](23)
    val short = Array.ofDim[Int](13, 3)
  }

  /** MPEG-1 scalefactor read; `prev` carries granule-0 values for
    * scfsi groups (valid only for long-block granule pairs).
    */
  private def scalefacsV1(b: Bits, gi: GrInfo, granule: Int, scfsi: Array[Int],
                          prev: Scalefacs): Scalefacs = {
    val out = new Scalefacs
    val (s1, s2) = Slen(gi.sfCompress)
    if (gi.windowSwitching && gi.blockType == 2) {
      if (gi.mixed) {
        for (sfb <- 0 until 8) out.long(sfb) = b.u(s1)
        for (sfb <- 3 until 6; w <- 0 until 3) out.short(sfb)(w) = b.u(s1)
        for (sfb <- 6 until 12; w <- 0 until 3) out.short(sfb)(w) = b.u(s2)
      } else {
        for (sfb <- 0 until 6; w <- 0 until 3) out.short(sfb)(w) = b.u(s1)
        for (sfb <- 6 until 12; w <- 0 until 3) out.short(sfb)(w) = b.u(s2)
      }
    } else {
      val groups = Array((0, 6, s1), (6, 11, s1), (11, 16, s2), (16, 21, s2))
      for (((lo, hi, slen), g) <- groups.zipWithIndex) {
        if (granule == 1 && scfsi(g) == 1)
          for (sfb <- lo until hi) out.long(sfb) = prev.long(sfb)
        else
          for (sfb <- lo until hi) out.long(sfb) = b.u(slen)
      }
    }
    out
  }

  /** LSF (MPEG-2) scalefactor read, non-intensity channels only —
    * intensity-coded LSF channels are a documented boundary.
    */
  private def scalefacsLsf(b: Bits, gi: GrInfo): Scalefacs = {
    val sc = gi.sfCompress
    val slen = new Array[Int](4)
    val block =
      if (sc < 400) {
        slen(0) = (sc >> 4) / 5; slen(1) = (sc >> 4) % 5
        slen(2) = (sc % 16) >> 2; slen(3) = sc % 4
        gi.preflag = false; 0
      } else if (sc < 500) {
        val t = sc - 400
        slen(0) = (t >> 2) / 5; slen(1) = (t >> 2) % 5
        slen(2) = t % 4; slen(3) = 0
        gi.preflag = false; 1
      } else {
        val t = sc - 500
        slen(0) = t / 3; slen(1) = t % 3; slen(2) = 0; slen(3) = 0
        gi.preflag = true; 2
      }
    val winKind =
      if (gi.windowSwitching && gi.blockType == 2) { if (gi.mixed) 2 else 1 } else 0
    val counts = LsfNrSfb(block)(winKind)
    val flat = new Array[Int](counts.sum)
    var i = 0
    for (g <- 0 until 4; _ <- 0 until counts(g)) { flat(i) = b.u(slen(g)); i += 1 }
    val out = new Scalefacs
    winKind match {
      case 0 => for (sfb <- 0 until math.min(21, flat.length)) out.long(sfb) = flat(sfb)
      case 1 => for (sfb <- 0 until 12; w <- 0 until 3) out.short(sfb)(w) = flat(3 * sfb + w)
      case 2 =>
        for (sfb <- 0 until 6) out.long(sfb) = flat(sfb)
        var p = 6
        for (sfb <- 3 until 12; w <- 0 until 3) { out.short(sfb)(w) = flat(p); p += 1 }
    }
    out
  }

  // ---------------------------------------------------------------
  // Spectral (Huffman) read
  // ---------------------------------------------------------------
  /** Decodes 576 quantized lines; returns the zero-run start. */
  private def spectra(b: Bits, gi: GrInfo, srIdx: Int, lsf: Boolean,
                      partEnd: Long, out: Array[Int],
                      tables: Array[HuffTable]): Int = {
    java.util.Arrays.fill(out, 0)
    val longTab = if (lsf) SfbLongLsf(srIdx) else SfbLong(srIdx)
    val (r1, r2) =
      if (gi.windowSwitching) {
        // the implicit region0_count resolves through the ACTIVE
        // scalefactor-band sequence: 8 window-bands for short
        // non-mixed blocks (3*shortTab(3)), 8 long bands otherwise
        // (longTab(8)). Both read 36 on every MPEG-1 table, but the
        // LSF long tables put longTab(8) at 50/54 — a 36 literal
        // desyncs the Huffman walk on real LSF transients
        // (advice-r16; boundary pinned independently in Mp3Spec)
        val shortTab = if (lsf) SfbShortLsf(srIdx) else SfbShort(srIdx)
        val b = if (gi.blockType == 2 && !gi.mixed) 3 * shortTab(3) else longTab(8)
        (b, 576)
      }
      else (longTab(math.min(gi.region0 + 1, 22)),
            longTab(math.min(gi.region0 + gi.region1 + 2, 22)))
    val bigMax = math.min(gi.bigValues * 2, 576)
    var i = 0
    while (i < bigMax) {
      val sel = if (i < r1) gi.tableSelect(0)
                else if (i < r2) gi.tableSelect(1)
                else gi.tableSelect(2)
      if (sel == 4 || sel == 14) throw new Malformed
      if (sel != 0) {
        val tab = tables(sel)
        if (tab == null) throw new UncarriedTable
        val e = tab.decode(b)
        var x = e / tab.ylen; var y = e % tab.ylen
        if (x == 15 && tab.linbits > 0) x += b.u(tab.linbits)
        if (x != 0 && b.u1() == 1) x = -x
        if (y == 15 && tab.linbits > 0) y += b.u(tab.linbits)
        if (y != 0 && b.u1() == 1) y = -y
        out(i) = x; out(i + 1) = y
      }
      i += 2
    }
    // count1 quadruples against the bit budget
    val c1 = if (gi.count1Sel == 0) Mp3Tables.Count1A else Mp3Tables.Count1B
    var done = false
    while (!done && b.pos < partEnd && i <= 572) {
      val start = b.pos
      val v = c1.decode(b)
      var j = 0
      while (j < 4) {
        val bit = (v >> (3 - j)) & 1
        var s = 0
        if (bit == 1) s = if (b.u1() == 1) -1 else 1
        out(i + j) = s
        j += 1
      }
      if (b.pos > partEnd || b.overran) { // overran the budget: roll the quad back
        var k = 0
        while (k < 4) { out(i + k) = 0; k += 1 }
        b.pos = start
        done = true
      } else i += 4
    }
    b.pos = partEnd
    b.overran = false
    math.min(i, 576)
  }

  // ---------------------------------------------------------------
  // Requantize + reorder
  // ---------------------------------------------------------------
  private def pow2(x: Double): Double = math.pow(2.0, x)
  private def pow43(v: Int): Double = {
    val a = math.abs(v)
    val m = math.pow(a, 4.0 / 3.0)
    if (v < 0) -m else m
  }

  /** Requantizes `is` into `xr` (and reorders short regions into the
    * [subband][window][line] layout the IMDCT consumes).
    */
  private def requantize(gi: GrInfo, sf: Scalefacs, is: Array[Int], xr: Array[Double],
                         srIdx: Int, lsf: Boolean): Unit = {
    java.util.Arrays.fill(xr, 0.0)
    val longTab = if (lsf) SfbLongLsf(srIdx) else SfbLong(srIdx)
    val shortTab = if (lsf) SfbShortLsf(srIdx) else SfbShort(srIdx)
    val gainBase = 0.25 * (gi.globalGain - 210)
    val mult = if (gi.sfScale == 0) 0.5 else 1.0
    val shortBlock = gi.windowSwitching && gi.blockType == 2
    val longLines =
      if (!shortBlock) 576
      else if (gi.mixed) 36
      else 0
    // long region
    if (longLines > 0) {
      var sfb = 0
      var i = 0
      while (i < longLines && sfb < 22) {
        val end = math.min(longTab(sfb + 1), longLines)
        val pre = if (gi.preflag) Pretab(sfb) else 0
        val g = pow2(gainBase - mult * (sf.long(sfb) + pre))
        while (i < end) { if (is(i) != 0) xr(i) = pow43(is(i)) * g; i += 1 }
        sfb += 1
      }
    }
    // short region: huffman order is (band, window, line); reorder to
    // xr(sb*18 + w*6 + j) where the line's in-window index is sb*6+j
    if (shortBlock) {
      val firstBand = if (gi.mixed) 3 else 0
      var src = longLines
      var sfb = firstBand
      while (sfb < 13 && src < 576) {
        val w0 = shortTab(sfb); val w1 = shortTab(sfb + 1)
        val width = w1 - w0
        var w = 0
        while (w < 3) {
          val g = pow2(gainBase - 2.0 * gi.subblockGain(w) - mult * sf.short(math.min(sfb, 12))(w))
          var k = 0
          while (k < width && src < 576) {
            val line = w0 + k
            val dst = (line / 6) * 18 + w * 6 + (line % 6)
            if (is(src) != 0 && dst < 576) xr(dst) = pow43(is(src)) * g
            src += 1; k += 1
          }
          w += 1
        }
        sfb += 1
      }
    }
  }

  // ---------------------------------------------------------------
  // Stereo
  // ---------------------------------------------------------------
  private val Sqrt2Inv = 1.0 / math.sqrt(2.0)

  /** MS + MPEG-1 intensity. `rzero` is the right channel's decoded
    * zero-run start (the intensity zone begins at its band boundary).
    */
  private def stereo(h: Header, gi: GrInfo, sfRight: Scalefacs,
                     l: Array[Double], r: Array[Double], rzero: Int): Unit = {
    if (h.mode != 1) return
    val ms = (h.modeExt & 2) != 0
    val intensity = (h.modeExt & 1) != 0
    if (intensity && h.lsf) throw new UncarriedTable // documented boundary
    val longTab = SfbLong(h.srIdx); val shortTab = SfbShort(h.srIdx)
    val shortBlock = gi.windowSwitching && gi.blockType == 2
    def msPair(i: Int): Unit = {
      val m = l(i); val s = r(i)
      l(i) = (m + s) * Sqrt2Inv; r(i) = (m - s) * Sqrt2Inv
    }
    if (!intensity) {
      if (ms) { var i = 0; while (i < 576) { msPair(i); i += 1 } }
      return
    }
    // Long-layout intensity over bands [from, until): the zone starts
    // at the band containing rzero (ROUNDED UP — review-r16); MS
    // applies below it. ISO reuses the LAST transmitted band's is_pos
    // for the remainder band 21, so the band loop runs through the
    // final band with a clamped scalefactor index (advice-r16 — the
    // old <21 loop left the tail untouched, a sqrt(2)-scaled top-band
    // error whenever is_pos==7 under MS).
    def intensityLong(from: Int, until: Int, rz: Int): Unit = {
      var startBand = until
      var sfb = from
      while (sfb < until) { if (longTab(sfb) >= rz) { startBand = sfb; sfb = until } else sfb += 1 }
      var i = longTab(from)
      val bound = longTab(startBand)
      while (i < bound) { if (ms) msPair(i); i += 1 }
      sfb = startBand
      while (sfb < until) {
        val isPos = sfRight.long(math.min(sfb, 20))
        var j = longTab(sfb)
        val end = longTab(sfb + 1)
        if (isPos != 7) {
          val ratio = math.tan(isPos * math.Pi / 12.0)
          while (j < end) { val v = l(j); l(j) = v * ratio / (1 + ratio); r(j) = v / (1 + ratio); j += 1 }
        } else if (ms) { while (j < end) { msPair(j); j += 1 } }
        sfb += 1
      }
    }
    // Short-window intensity from `firstBand` on: the zone starts at
    // the first band whose flat (huffman-order) start reaches rz.
    // MS below the zone goes by BAND membership, not a contiguous
    // reordered prefix — shortTab boundaries are not multiples of 6,
    // so the prefix [0, 3*shortTab(sfb)) mixes lines from both sides
    // of the boundary in the reordered layout (review-r16 finding).
    // The band loop runs through the final band 12 with band 11's
    // is_pos (advice-r16, same tail rule as the long path).
    def intensityShort(firstBand: Int, rz: Int): Unit = {
      var startBand = 13
      var b = firstBand
      while (b < 13) { if (shortTab(b) * 3 >= rz) { startBand = b; b = 13 } else b += 1 }
      var line = shortTab(firstBand)
      while (line < shortTab(startBand)) {
        var w = 0
        while (w < 3) {
          val idx = (line / 6) * 18 + w * 6 + (line % 6)
          if (ms && idx < 576) msPair(idx)
          w += 1
        }
        line += 1
      }
      var band = startBand
      while (band < 13) {
        val width = shortTab(band + 1) - shortTab(band)
        var w = 0
        while (w < 3) {
          val isPos = sfRight.short(math.min(band, 11))(w)
          val ratio = if (isPos != 7) math.tan(isPos * math.Pi / 12.0) else -1.0
          var k = 0
          while (k < width) {
            val line = shortTab(band) + k
            val idx = (line / 6) * 18 + w * 6 + (line % 6)
            if (idx < 576) {
              if (isPos != 7) { val v = l(idx); l(idx) = v * ratio / (1 + ratio); r(idx) = v / (1 + ratio) }
              else if (ms) msPair(idx)
            }
            k += 1
          }
          w += 1
        }
        band += 1
      }
    }
    if (!shortBlock) intensityLong(0, 22, rzero)
    else if (gi.mixed && rzero < 36) {
      // mixed block with the zone starting inside the LONG region:
      // lines < 36 are stored in long layout, so the window-domain
      // indexing of the short path would hit the wrong lines
      // (advice-r16). Long-band intensity over bands 0..7
      // (longTab(8) == 36), then every short band is in the zone.
      intensityLong(0, 8, rzero)
      intensityShort(3, 0)
    } else {
      val firstBand = if (gi.mixed) 3 else 0
      if (gi.mixed && ms) { var i = 0; while (i < 36) { msPair(i); i += 1 } }
      intensityShort(firstBand, rzero)
    }
  }

  // ---------------------------------------------------------------
  // Alias reduction, IMDCT, frequency inversion
  // ---------------------------------------------------------------
  private def aliasReduce(xr: Array[Double], gi: GrInfo): Unit = {
    val shortBlock = gi.windowSwitching && gi.blockType == 2
    if (shortBlock && !gi.mixed) return
    val sbLim = if (shortBlock) 2 else 32
    var sb = 1
    while (sb < sbLim) {
      var i = 0
      while (i < 8) {
        val a = xr(18 * sb - 1 - i); val b = xr(18 * sb + i)
        xr(18 * sb - 1 - i) = a * AliasCs(i) - b * AliasCa(i)
        xr(18 * sb + i) = b * AliasCs(i) + a * AliasCa(i)
        i += 1
      }
      sb += 1
    }
  }

  // IMDCT windows from the spec's sine formulas
  private val WinNormal = Array.tabulate(36)(i => math.sin(math.Pi / 36 * (i + 0.5)))
  private val WinStart = Array.tabulate(36) { i =>
    if (i < 18) math.sin(math.Pi / 36 * (i + 0.5))
    else if (i < 24) 1.0
    else if (i < 30) math.sin(math.Pi / 12 * (i - 18 + 0.5))
    else 0.0
  }
  private val WinStop = Array.tabulate(36) { i =>
    if (i < 6) 0.0
    else if (i < 12) math.sin(math.Pi / 12 * (i - 6 + 0.5))
    else if (i < 18) 1.0
    else math.sin(math.Pi / 36 * (i + 0.5))
  }
  private val WinShort = Array.tabulate(12)(i => math.sin(math.Pi / 12 * (i + 0.5)))
  private val CosL = Array.tabulate(36, 18)((i, k) =>
    math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1)))
  private val CosS = Array.tabulate(12, 6)((i, k) =>
    math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1)))

  /** One subband's IMDCT + windowing + overlap-add into `out`(18),
    * updating `store`(18).
    */
  private def imdctSubband(xr: Array[Double], off: Int, blockType: Int,
                           store: Array[Double], out: Array[Double]): Unit = {
    val raw = new Array[Double](36)
    if (blockType == 2) {
      var w = 0
      while (w < 3) {
        var i = 0
        while (i < 12) {
          var acc = 0.0
          var k = 0
          while (k < 6) { acc += xr(off + w * 6 + k) * CosS(i)(k); k += 1 }
          raw(6 + 6 * w + i) += acc * WinShort(i)
          i += 1
        }
        w += 1
      }
    } else {
      val win = blockType match {
        case 1 => WinStart
        case 3 => WinStop
        case _ => WinNormal
      }
      var i = 0
      while (i < 36) {
        var acc = 0.0
        var k = 0
        while (k < 18) { acc += xr(off + k) * CosL(i)(k); k += 1 }
        raw(i) = acc * win(i)
        i += 1
      }
    }
    var j = 0
    while (j < 18) {
      out(j) = raw(j) + store(j)
      store(j) = raw(j + 18)
      j += 1
    }
  }

  // ---------------------------------------------------------------
  // Polyphase synthesis (canonical pseudo-QMF; see the scaladoc's
  // epistemic note). Window table + modulation in Mp3Synthesis.
  // ---------------------------------------------------------------
  private[graft] final class ChannelState {
    val store = Array.ofDim[Double](32, 18)
    val vfifo = new Array[Double](16 * 128)
    var vpos = 0
  }

  private[graft] def synthesisStep(st: ChannelState, s: Array[Double],
                                        out: Array[Double], off: Int): Unit = {
    st.vpos = (st.vpos + 15) & 15
    val base = st.vpos << 7
    val mod = Mp3Synthesis.SynMod
    var r = 0
    while (r < 128) {
      var acc = 0.0
      val row = mod(r)
      var k = 0
      while (k < 32) { acc += row(k) * s(k); k += 1 }
      st.vfifo(base + r) = acc
      r += 1
    }
    val win = Mp3Synthesis.Window
    var j = 0
    while (j < 32) {
      var acc = 0.0
      var m = 0
      while (m < 16) {
        val idx = (m << 5) + j
        acc += win(idx) * st.vfifo((((st.vpos + m) & 15) << 7) + (idx & 127))
        m += 1
      }
      out(off + j) = acc * Mp3Synthesis.Gain
      j += 1
    }
  }

  // ---------------------------------------------------------------
  // Frame walk
  // ---------------------------------------------------------------
  def supports(data: Array[Byte]): Boolean = {
    val off = skipId3(data)
    parseHeader(data, off) match {
      case None => false
      case Some(h) =>
        // demand a second chained header (or clean EOF) so random
        // binary with a lone 0xFFE never routes here
        val next = off.toLong + h.frameLen
        next >= data.length || parseHeader(data, next.toInt).isDefined
    }
  }

  /** Header-only frame walk: hop frame headers by their declared
    * lengths and sum granule samples (1152/frame MPEG-1, 576 LSF) —
    * no side info, no Huffman, no synthesis, so it is also total over
    * streams whose big-value tables are uncarried (where [[decode]]
    * degrades to None, the metadata is still real). Counts only
    * frames whose bytes fully fit; stops at the first lost sync (a
    * trailing tag walks off the same way [[decode]]'s walk does).
    */
  override def probeFrames(data: Array[Byte]): Option[Long] = {
    if (!supports(data)) return None
    var off = skipId3(data).toLong
    var samples = 0L
    var any = false
    var done = false
    while (!done && off + 4 <= data.length) {
      parseHeader(data, off.toInt) match {
        case Some(h) if off + h.frameLen <= data.length =>
          any = true
          samples += (if (h.lsf) 576L else 1152L)
          off += h.frameLen
        case _ => done = true
      }
    }
    if (any) Some(samples) else None
  }

  def decode(data: Array[Byte]): Option[Array[Double]] =
    // specific belt, not a Throwable net: a fatal VM error (OOM during
    // the output buffer growth of an adversarial stream) must fail the
    // task, and an unexpected decoder NPE must surface in the fuzz
    // instead of reading as a silent None (review-r16)
    try decodeWith(Mp3Tables.BigValue, data)
    catch {
      case _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None
    }

  /** Decode with an explicit big-value table array — the seam Mp3Spec
    * uses to fuzz the escape/linbits engine through synthetic
    * surrogate tables; production callers use [[decode]].
    */
  private[graft] def decodeWith(tables: Array[HuffTable],
                                     data: Array[Byte]): Option[Array[Double]] = {
    var off = skipId3(data)
    val first = parseHeader(data, off).getOrElse(return None)
    val ch = first.channels
    val states = Array.fill(ch)(new ChannelState)
    var reservoir = new Array[Byte](0)
    val outBuf = new scala.collection.mutable.ArrayBuffer[Double](1 << 16)
    val is = new Array[Int](576)
    val xrs = Array.ofDim[Double](2, 576)
    val prevSf = Array.fill(ch)(new Scalefacs)
    var frames = 0
    val maxSamples = 1 << 26

    try {
      while (off + 4 <= data.length && outBuf.length < maxSamples) {
        val h = parseHeader(data, off) match {
          case Some(x)
            if x.lsf == first.lsf && x.srIdx == first.srIdx && x.channels == ch => x
          case _ =>
            // sync lost mid-stream. A short remainder is a legitimate
            // trailer (ID3v1 is 128 bytes, APE tags are small); a
            // frame-sized-or-larger remainder means a corrupted header
            // inside the stream — same loud-degradation rule as a
            // corrupt frame body (review-r16)
            if (data.length - off > math.max(first.frameLen, 192)) throw new Malformed
            off = data.length; null
        }
        if (h != null) {
          if (off + h.frameLen > data.length) { off = data.length }
          else {
            val sideBytes = if (h.lsf) { if (ch == 1) 9 else 17 } else { if (ch == 1) 17 else 32 }
            val headerBytes = 4 + (if (h.crc) 2 else 0)
            val mainLen = h.frameLen - headerBytes - sideBytes
            if (mainLen < 0) throw new Malformed
            val sb = new Bits(data, (off + headerBytes).toLong * 8, (off + headerBytes + sideBytes).toLong * 8)
            val si = parseSideInfo(sb, h)
            val main = java.util.Arrays.copyOfRange(data, off + headerBytes + sideBytes,
              off + h.frameLen)
            val nGr = if (h.lsf) 1 else 2
            if (si.mainDataBegin <= reservoir.length) {
              // main-data buffer = reservoir tail + this frame's bytes
              val tail = si.mainDataBegin
              val buf = new Array[Byte](tail + main.length)
              System.arraycopy(reservoir, reservoir.length - tail, buf, 0, tail)
              System.arraycopy(main, 0, buf, tail, main.length)
              val b = new Bits(buf, 0L, buf.length.toLong * 8)
              var g = 0
              while (g < nGr) {
                val sfs = new Array[Scalefacs](ch)
                val rzeros = new Array[Int](ch)
                var c = 0
                while (c < ch) {
                  val gi = si.gr(g)(c)
                  val partStart = b.pos
                  val partEnd = partStart + gi.part23
                  if (partEnd > b.endBit) throw new Malformed
                  val sf =
                    if (h.lsf) scalefacsLsf(b, gi)
                    else scalefacsV1(b, gi, g, si.scfsi(c), prevSf(c))
                  if (b.pos > partEnd) throw new Malformed
                  if (g == 0 && !h.lsf) prevSf(c) = sf
                  sfs(c) = sf
                  rzeros(c) = spectra(b, gi, h.srIdx, h.lsf, partEnd, is, tables)
                  requantize(gi, sf, is, xrs(c), h.srIdx, h.lsf)
                  c += 1
                }
                if (ch == 2) stereo(h, si.gr(g)(0), sfs(1), xrs(0), xrs(1), rzeros(1))
                // per channel: alias, IMDCT, freq inversion, synthesis
                val outOff = outBuf.length
                var t = 0
                while (t < 576) { outBuf += 0.0; t += 1 }
                c = 0
                while (c < ch) {
                  val gi = si.gr(g)(c)
                  aliasReduce(xrs(c), gi)
                  val shortBlock = gi.windowSwitching && gi.blockType == 2
                  val grOut = Array.ofDim[Double](32, 18)
                  var sbnd = 0
                  while (sbnd < 32) {
                    val bt =
                      if (shortBlock && (!gi.mixed || sbnd >= 2)) 2
                      else if (sbnd < 2 && shortBlock && gi.mixed) 0
                      else gi.blockType
                    imdctSubband(xrs(c), sbnd * 18, bt, states(c).store(sbnd), grOut(sbnd))
                    // frequency inversion (odd subband, odd sample)
                    if ((sbnd & 1) == 1) {
                      var jj = 1
                      while (jj < 18) { grOut(sbnd)(jj) = -grOut(sbnd)(jj); jj += 2 }
                    }
                    sbnd += 1
                  }
                  val sline = new Array[Double](32)
                  val pcm = new Array[Double](32)
                  var step = 0
                  while (step < 18) {
                    var k = 0
                    while (k < 32) { sline(k) = grOut(k)(step); k += 1 }
                    synthesisStep(states(c), sline, pcm, 0)
                    var jj = 0
                    while (jj < 32) {
                      outBuf(outOff + step * 32 + jj) += pcm(jj) / ch
                      jj += 1
                    }
                    step += 1
                  }
                  c += 1
                }
                g += 1
              }
            } else {
              // reservoir starved (stream cut in): keep timing with silence
              var t = 0
              while (t < nGr * 576) { outBuf += 0.0; t += 1 }
            }
            // roll the reservoir forward (main_data_begin is 8/9 bits,
            // so 511 bytes of history always suffice)
            val keep = math.min(511, reservoir.length + main.length)
            val nr = new Array[Byte](keep)
            val fromMain = math.min(keep, main.length)
            System.arraycopy(main, main.length - fromMain, nr, keep - fromMain, fromMain)
            if (keep > fromMain)
              System.arraycopy(reservoir, reservoir.length - (keep - fromMain), nr, 0, keep - fromMain)
            reservoir = nr
            frames += 1
            off += h.frameLen
          }
        }
      }
    } catch {
      case _: UncarriedTable => return None
      case _: Malformed =>
        // The walk only decodes frames whose bytes are FULLY present
        // (truncated tails break out of the loop instead), so reaching
        // here means a complete frame failed to parse: mid-stream
        // corruption. "Loud, never wrong": a silently shortened clip
        // would embed confidently over a fraction of the audio
        // (review-r16) — degrade the whole payload.
        return None
    }
    if (frames == 0 || outBuf.isEmpty) None else Some(outBuf.toArray)
  }
}

/** Synthesis-bank tables for [[Mp3Decoder]]: the in-repo near-PR
  * prototype (see the decoder scaladoc's epistemic note) and the
  * canonical pseudo-QMF modulation. `Gain` normalizes the composite
  * analysis→synthesis chain to unity (value measured from the designed
  * prototype; Mp3Spec asserts the round-trip is unit-gain to 1e-3, so
  * a drifted table or constant fails loudly).
  */
private[graft] object Mp3Synthesis {

  /** 512-tap symmetric prototype, first half (tap n = HalfWindow(n)
    * for n < 256, HalfWindow(511-n) after). Designed by Nyquist-64
    * autocorrelation + stopband minimization; pinned by the near-PR
    * law in Mp3Spec (94+ dB round-trip; single-tap 1e-3 perturbation
    * collapses to ~44 dB).
    */
  private val HalfWindow: Array[Double] = Array(
    -1.26240491057881075e-07, -2.15761371419950324e-07, -3.19968712667407606e-07, -4.39428732581047679e-07,
    -5.74574425831578884e-07, -7.25692347670447302e-07, -8.92910893104206311e-07, -1.07619033963823209e-06,
    -1.27531491140758196e-06, -1.48988710368065432e-06, -1.71932448869370674e-06, -1.96285919793060713e-06,
    -2.21954024657313783e-06, -2.48823883379212647e-06, -2.76765671504101290e-06, -3.05633770298306690e-06,
    -3.35268231018817863e-06, -3.65496549953157590e-06, -3.96135746330775529e-06, -4.26994729963527739e-06,
    -4.57876940470046117e-06, -4.88583235027313733e-06, -5.18914996356110097e-06, -5.48677427649556255e-06,
    -5.77682996599801283e-06, -6.05754985881251068e-06, -6.32731103383711088e-06, -6.58467101526648782e-06,
    -6.82840351737891137e-06, -7.05753317124667455e-06, -7.27136864299565327e-06, -7.46953353509142324e-06,
    -7.65199445355752795e-06, -7.81908562236117142e-06, -7.97152943167237006e-06, -8.11045232022235583e-06,
    -8.23739541568083417e-06, -8.35431938835609797e-06, -8.46360300998635543e-06, -8.56803496122537179e-06,
    -8.67079848716920010e-06, -8.77544856173399571e-06, -8.88588129829456550e-06, -9.00629542173008806e-06,
    -9.14114570104819205e-06, -9.29508833834956965e-06, -9.47291840380308244e-06, -9.67949950834384174e-06,
    -9.91968601229539231e-06, -1.01982381740095840e-05, -1.05197307516773431e-05, -1.08884556789264715e-05,
    -1.13083195442520147e-05, -1.17827367059543685e-05, -1.23145189783058285e-05, -1.29057629201770988e-05,
    -1.35577358448291112e-05, -1.42707617559389827e-05, -1.50441084859771294e-05, -1.58758773776905634e-05,
    -1.67628969027910500e-05, -1.77006216521503193e-05, -1.86830381619501765e-05, -1.97025790517814239e-05,
    -2.07500472799645635e-05, -2.18145496154582764e-05, -2.28834477552631010e-05, -2.39423175821087623e-05,
    -2.49749273165801032e-05, -2.59632314978073521e-05, -2.68873827617040105e-05, -2.77257624613103832e-05,
    -2.84550310518198283e-05, -2.90501990224825066e-05, -2.94847190090617967e-05, -2.97305995568002523e-05,
    -2.97585408276348145e-05, -2.95380923633048239e-05, -2.90378328211791326e-05, -2.82255714004017308e-05,
    -2.70685704709022901e-05, -2.55337887087288654e-05, -2.35881438285584367e-05, -2.11987937968668029e-05,
    -1.83334351980543673e-05, -1.49606172193768647e-05, -1.10500695269346865e-05, -6.57304210589884612e-06,
    -1.50265496216680358e-06, 4.18574458828581938e-06, 1.05142194772654155e-05, 1.75018778626779504e-05,
    2.51645082259912681e-05, 3.35142173984771547e-05, 4.25590744112396927e-05, 5.23027631329071288e-05,
    6.27442467058954935e-05, 7.38774468160515628e-05, 8.56909408307412638e-05, 9.81676798191352950e-05,
    1.11284730424094446e-04, 1.25013043482369930e-04, 1.39317252199039641e-04, 1.54155502567078154e-04,
    1.69479318581395932e-04, 1.85233504637628783e-04, 2.01356087326952420e-04, 2.17778298632461060e-04,
    2.34424602316824485e-04, 2.51212765056154448e-04, 2.68053973616785097e-04, 2.84852999114162053e-04,
    3.01508409113811974e-04, 3.17912828043590077e-04, 3.33953246100298512e-04, 3.49511376528307226e-04,
    3.64464060846249750e-04, 3.78683721294920052e-04, 3.92038859477099723e-04, 4.04394599854834456e-04,
    4.15613276481324983e-04, 4.25555061054332421e-04, 4.34078630096292159e-04, 4.41041868804179079e-04,
    4.46302608854672880e-04, 4.49719397208971073e-04, 4.51152292740638391e-04, 4.50463687300089305e-04,
    4.47519152653092162e-04, 4.42188273320335157e-04, 4.34345568618098342e-04, 4.23871333083673362e-04,
    4.10652535516017880e-04, 3.94583706412257303e-04, 3.75567822000149633e-04, 3.53517180555286675e-04,
    3.28354266669876930e-04, 3.00012599139013792e-04, 2.68437558160866923e-04, 2.33587187584262331e-04,
    1.95432968002170982e-04, 1.53960556571822264e-04, 1.09170489540106301e-04, 6.10788435691950068e-05,
    9.71785208881544752e-06, -4.48635269524870172e-05, -1.02599095406369218e-04, -1.63404954610805710e-04,
    -2.27179103558223264e-04, -2.93801098469386834e-04, -3.63131776494476346e-04, -4.35013046054251711e-04,
    -5.09267746120812691e-04, -5.85699576513442201e-04, -6.64093101061460889e-04, -7.44213825254685089e-04,
    -8.25808349768410773e-04, -9.08604601013717232e-04, -9.92312139623907673e-04, -1.07662254754794357e-03,
    -1.16120989417840999e-03, -1.24573128169556328e-03, -1.32982746956554856e-03, -1.41312357788156927e-03,
    -1.49522986898826572e-03, -1.57574260657967623e-03, -1.65424499120891163e-03, -1.73030817089203800e-03,
    -1.80349232523657516e-03, -1.87334782126274729e-03, -1.93941643882811036e-03, -2.00123266330239948e-03,
    -2.05832504287501491e-03, -2.11021760760974697e-03, -2.15643134709144835e-03, -2.19648574323802253e-03,
    -2.22990035457735179e-03, -2.25619644801398813e-03, -2.27489867383502339e-03, -2.28553677942936557e-03,
    -2.28764735691842046e-03, -2.28077561962662656e-03, -2.26447720204827957e-03, -2.23831997770267783e-03,
    -2.20188588901266578e-03, -2.15477278308888551e-03, -2.09659624706057561e-03, -2.02699143636690584e-03,
    -1.94561488920316186e-03, -1.85214632011914781e-03, -1.74629038558439748e-03, -1.62777841417341266e-03,
    -1.49637009315854654e-03, -1.35185510916628225e-03, -1.19405471970685699e-03, -1.02282327194100331e-03,
    -8.38049640093621335e-04, -6.39658583291765779e-04, -4.27612014337921270e-04, -2.01910171819094349e-04,
    3.74073119181685091e-05, 2.90260454220249930e-04, 5.56528084083133504e-04, 8.36047129426481603e-04,
    1.12861203618604372e-03, 1.43397432537437064e-03, 1.75184229385212751e-03, 2.08188086410475599e-03,
    2.42371158782549948e-03, 2.77691280756351203e-03, 3.14101998011182383e-03, 3.51552616468674313e-03,
    3.89988267828153198e-03, 4.29349991987613110e-03, 4.69574836444883355e-03, 5.10595972696632587e-03,
    5.52342829573332101e-03, 5.94741243366864007e-03, 6.37713624523315436e-03, 6.81179140588776804e-03,
    7.25053915010128065e-03, 7.69251241305965970e-03, 8.13681812037255446e-03, 8.58253961921700941e-03,
    9.02873924351511696e-03, 9.47446100492327359e-03, 9.91873340061263237e-03, 1.03605723280528923e-02,
    1.07989840962802990e-02, 1.12329685224448039e-02, 1.16615221017888557e-02, 1.20836412386187437e-02,
    1.24983255253054582e-02, 1.29045810558772508e-02, 1.33014237603666548e-02, 1.36878827457451880e-02,
    1.40630036290196707e-02, 1.44258518478858067e-02, 1.47755159342330307e-02, 1.51111107357794986e-02,
    1.54317805711771394e-02, 1.57367023040763838e-02, 1.60250883218759875e-02, 1.62961894051961501e-02,
    1.65492974745144322e-02, 1.67837482008861699e-02, 1.69989234682288715e-02, 1.71942536752883388e-02,
    1.73692198661128012e-02, 1.75233556786404572e-02, 1.76562491018481850e-02, 1.77675440328130818e-02,
    1.78569416259954268e-02, 1.79242014280571946e-02, 1.79691422925780109e-02, 1.79916430701154949e-02
  )

  val Window: Array[Double] = Array.tabulate(512)(n => if (n < 256) HalfWindow(n) else HalfWindow(511 - n))

  /** Composite unit-gain normalization for the designed prototype. */
  val Gain: Double = 128.422

  /** Synthesis modulation: cos((2k+1)(r-255.5)pi/64 - (-1)^k pi/4),
    * periodic in the tap index with period 128 (which is what lets the
    * 16x128 FIFO address the full 512-tap window).
    */
  val SynMod: Array[Array[Double]] = Array.tabulate(128, 32) { (r, k) =>
    val phi = (if ((k & 1) == 0) 1.0 else -1.0) * math.Pi / 4
    math.cos((2 * k + 1) * math.Pi / 64 * (r - 255.5) - phi)
  }

  /** Analysis modulation (the mirror bank): +phi_k. Lives in the
    * product so the encoder-side analysis in tests and any future
    * encoding path share one definition with the synthesis they must
    * invert.
    */
  val AnaMod: Array[Array[Double]] = Array.tabulate(128, 32) { (r, k) =>
    val phi = (if ((k & 1) == 0) 1.0 else -1.0) * math.Pi / 4
    math.cos((2 * k + 1) * math.Pi / 64 * (r - 255.5) + phi)
  }

  /** Analysis step over a newest-first 512-sample window: the exact
    * mirror of [[Mp3Decoder.synthesisStep]]'s bank (fold to 128, then
    * modulate). Used by the PR pin and the test encoder.
    */
  def analysisStep(newestFirst: Array[Double], out: Array[Double]): Unit = {
    val f = new Array[Double](128)
    var n = 0
    while (n < 512) { f(n & 127) += newestFirst(n) * Window(n); n += 1 }
    var k = 0
    while (k < 32) {
      var acc = 0.0
      var r = 0
      while (r < 128) { acc += AnaMod(r)(k) * f(r); r += 1 }
      out(k) = acc
      k += 1
    }
  }
}
