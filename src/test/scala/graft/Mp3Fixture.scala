package graft

import graft.operators.multimodal.{Mp3Decoder, Mp3Synthesis}
import Mp3Decoder.{HuffTable, Mp3Tables}

import scala.collection.mutable.ArrayBuffer

/** Test-side MPEG-1/2 Layer III encoder + INDEPENDENT reconstruction —
  * the [[AdpcmTestEncoder]]/[[FlacTestEncoder]] discipline applied to
  * MP3: the Huffman code tables and window tables are shared with the
  * decoder (they define the bitstream / the designed filterbank), but
  * every arithmetic step — bit packing, requantization, reordering,
  * alias butterflies, IMDCT, overlap-add, polyphase synthesis — is
  * written out independently here (direct-form sums instead of the
  * decoder's folded/FIFO forms), so a typo on either side breaks the
  * fuzz instead of cancelling.
  */
object Mp3Fixture {

  // ------------------------------------------------------------------
  // Bit writer
  // ------------------------------------------------------------------
  final class BW {
    val buf = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    var bitPos = 0L
    def w(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nbits += 1
        bitPos += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def padToByte(): Unit = if (nbits > 0) w(0, 8 - nbits)
    def bytes: Array[Byte] = { require(nbits == 0); buf.toArray }
  }

  // ------------------------------------------------------------------
  // Granule description (the encoder's input; also the ref recon's)
  // ------------------------------------------------------------------
  final case class Gr(
      is: Array[Int],                   // 576 quantized lines
      scfL: Array[Int] = new Array[Int](21),
      scfS: Array[Array[Int]] = Array.fill(12)(new Array[Int](3)),
      globalGain: Int = 210,
      sfCompress: Int = 0,              // v1: 0-15; LSF: 0-511
      blockType: Int = 0,               // 0 long, 1 start, 2 short, 3 stop
      mixed: Boolean = false,
      tableSelect: Array[Int] = Array(1, 1, 1),
      subblockGain: Array[Int] = Array(0, 0, 0),
      region0: Int = 4, region1: Int = 3,
      preflag: Boolean = false,
      sfScale: Int = 0,
      count1Sel: Int = 0,
      bigValues: Int = 0,               // pairs
      count1: Int = 0)                  // quadruples

  /** Frame = one granule per channel (LSF) or two (MPEG-1). `scfsi`
    * ([channel][group]) marks granule-1 scalefactor groups copied from
    * granule 0 — the generator must then give granule 1 the same scfL
    * values in those bands (groups are 0-5, 6-10, 11-15, 16-20).
    */
  final case class Frame(gr: Array[Array[Gr]],
                         scfsi: Array[Array[Int]] = Array.fill(2)(new Array[Int](4)))

  // ------------------------------------------------------------------
  // Encoder
  // ------------------------------------------------------------------
  /** Encodes one granule's scalefactors + spectrum; returns part2_3_length. */
  private def writeGranule(bw: BW, g: Gr, lsf: Boolean,
                           tables: Array[HuffTable],
                           granule: Int, scfsi: Array[Int]): Int = {
    val start = bw.bitPos
    if (!lsf) {
      val (s1, s2) = Mp3Decoder.Slen(g.sfCompress)
      if (g.blockType == 2) {
        if (g.mixed) {
          for (sfb <- 0 until 8) bw.w(g.scfL(sfb), s1)
          for (sfb <- 3 until 6; w <- 0 until 3) bw.w(g.scfS(sfb)(w), s1)
          for (sfb <- 6 until 12; w <- 0 until 3) bw.w(g.scfS(sfb)(w), s2)
        } else {
          for (sfb <- 0 until 6; w <- 0 until 3) bw.w(g.scfS(sfb)(w), s1)
          for (sfb <- 6 until 12; w <- 0 until 3) bw.w(g.scfS(sfb)(w), s2)
        }
      } else {
        val groups = Array((0, 6, s1), (6, 11, s1), (11, 16, s2), (16, 21, s2))
        for (((lo, hi, slen), grp) <- groups.zipWithIndex)
          if (granule == 0 || scfsi(grp) == 0)
            for (sfb <- lo until hi) bw.w(g.scfL(sfb), slen)
      }
    } else {
      // LSF decomposition mirrors the decoder's (shared spec structure)
      val sc = g.sfCompress
      val slen = new Array[Int](4)
      val block =
        if (sc < 400) { slen(0) = (sc >> 4) / 5; slen(1) = (sc >> 4) % 5; slen(2) = (sc % 16) >> 2; slen(3) = sc % 4; 0 }
        else if (sc < 500) { val t = sc - 400; slen(0) = (t >> 2) / 5; slen(1) = (t >> 2) % 5; slen(2) = t % 4; slen(3) = 0; 1 }
        else { val t = sc - 500; slen(0) = t / 3; slen(1) = t % 3; slen(2) = 0; slen(3) = 0; 2 }
      val winKind = if (g.blockType == 2) { if (g.mixed) 2 else 1 } else 0
      val counts = Mp3Decoder.LsfNrSfb(block)(winKind)
      val flat: Array[Int] = winKind match {
        case 0 => g.scfL
        case 1 => Array.tabulate(36)(i => g.scfS(i / 3)(i % 3))
        case 2 => g.scfL.take(6) ++ (for (sfb <- 3 until 12; w <- 0 until 3) yield g.scfS(sfb)(w))
      }
      var i = 0
      for (grp <- 0 until 4; _ <- 0 until counts(grp)) {
        bw.w(if (i < flat.length) flat(i) else 0, slen(grp)); i += 1
      }
    }
    // spectrum
    val srIdx = 0
    val longTab = if (lsf) Mp3Decoder.SfbLongLsf(srIdx) else Mp3Decoder.SfbLong(srIdx)
    val shortTab = if (lsf) Mp3Decoder.SfbShortLsf(srIdx) else Mp3Decoder.SfbShort(srIdx)
    val (r1, r2) =
      if (g.blockType != 0)
        // implicit region0_count through the active band sequence:
        // 8 window-bands (short non-mixed) or 8 long bands — 36 on
        // every MPEG-1 table but 50/54 on the LSF long tables
        (if (g.blockType == 2 && !g.mixed) 3 * shortTab(3) else longTab(8), 576)
      else (longTab(g.region0 + 1), longTab(math.min(g.region0 + g.region1 + 2, 22)))
    var i = 0
    while (i < g.bigValues * 2) {
      val sel = if (i < r1) g.tableSelect(0) else if (i < r2) g.tableSelect(1) else g.tableSelect(2)
      if (sel != 0) {
        val tab = tables(sel)
        require(tab != null, s"encoder chose uncarried table $sel")
        var x = g.is(i); var y = g.is(i + 1)
        val ax = math.abs(x); val ay = math.abs(y)
        val cx = math.min(ax, 15); val cy = math.min(ay, 15)
        require(cx < tab.lens.length / tab.ylen && cy < tab.ylen, s"value out of range for table $sel")
        if (tab.linbits == 0) require(ax < 15 || ax == 15, "")
        val e = cx * tab.ylen + cy
        bw.w(tab.codes(e), tab.lens(e))
        if (cx == 15 && tab.linbits > 0) { require(ax - 15 < (1 << tab.linbits)); bw.w(ax - 15, tab.linbits) }
        if (ax != 0) bw.w(if (x < 0) 1 else 0, 1)
        if (cy == 15 && tab.linbits > 0) { require(ay - 15 < (1 << tab.linbits)); bw.w(ay - 15, tab.linbits) }
        if (ay != 0) bw.w(if (y < 0) 1 else 0, 1)
      } else require(g.is(i) == 0 && g.is(i + 1) == 0, "table 0 region must be zero")
      i += 2
    }
    val c1 = if (g.count1Sel == 0) Mp3Tables.Count1A else Mp3Tables.Count1B
    var q = 0
    while (q < g.count1) {
      var v = 0
      for (j <- 0 until 4) { val b = math.abs(g.is(i + j)); require(b <= 1); v = (v << 1) | b }
      bw.w(c1.codes(v), c1.lens(v))
      for (j <- 0 until 4) if (g.is(i + j) != 0) bw.w(if (g.is(i + j) < 0) 1 else 0, 1)
      i += 4; q += 1
    }
    val part23 = (bw.bitPos - start).toInt
    // the side-info field is 12 bits: a granule that cannot declare its
    // own length would silently desync the whole stream
    require(part23 <= 4095, s"part2_3_length $part23 exceeds the 12-bit field")
    part23
  }

  /** Assemble a stream. `capacityPad(i)` = extra ancillary bytes to
    * force into frame i's main region (0 = tight reservoir packing).
    * Bitrate index is chosen per frame as the smallest that fits.
    * 44.1 kHz (v1) / 22.05 kHz (LSF), srIdx 0.
    */
  def encode(frames: Seq[Frame], lsf: Boolean = false, mode: Int = 3,
             modeExt: Int = 0,
             tables: Array[HuffTable] = Mp3Tables.BigValue,
             padMd: Int => Int = _ => 0): Array[Byte] = {
    val ch = if (mode == 3) 1 else 2
    val nGr = if (lsf) 1 else 2
    val sideBytes = if (lsf) { if (ch == 1) 9 else 17 } else { if (ch == 1) 17 else 32 }
    // 1) encode every frame's main data (byte-padded), collect part23s
    val mds = new ArrayBuffer[Array[Byte]]()
    val part23s = new ArrayBuffer[Array[Array[Int]]]()
    for (f <- frames) {
      require(f.gr.length == nGr && f.gr.forall(_.length == ch))
      val bw = new BW
      val p = Array.ofDim[Int](nGr, ch)
      for (g <- 0 until nGr; c <- 0 until ch)
        p(g)(c) = writeGranule(bw, f.gr(g)(c), lsf, tables, g,
          if (lsf) new Array[Int](4) else f.scfsi(c))
      for (_ <- 0 until padMd(mds.length)) bw.w(0, 8) // ancillary padding
      bw.padToByte()
      mds += bw.bytes
      part23s += p
    }
    // 2) reservoir packing: R = concat(mds); frame i's region carries the
    // next capacity_i bytes; mdb_i = capPrefix(i) - offset(md_i)
    val rates = if (lsf) Array(0,8,16,24,32,40,48,56,64,80,96,112,128,144,160)
                else Array(0,32,40,48,56,64,80,96,112,128,160,192,224,256,320)
    val sr = if (lsf) 22050 else 44100
    val factor = if (lsf) 72000 else 144000
    // choose one bitrate for the whole stream: smallest whose capacity
    // fits the largest md (+ side/header) so mdb never exceeds capacity
    val maxMd = mds.map(_.length).max
    val bri = (1 until 15).find { b =>
      factor * rates(b) / sr - 4 - sideBytes >= maxMd
    }.getOrElse(throw new IllegalArgumentException(s"frame too large: $maxMd bytes"))
    val frameLen = factor * rates(bri) / sr
    val cap = frameLen - 4 - sideBytes
    // bound reservoir drift the way real encoders do: append ancillary
    // zeros to any frame whose successor would otherwise point back
    // further than main_data_begin can express
    val limit = if (lsf) 255 else 511
    var drift = 0
    for (i <- mds.indices) {
      var after = drift + cap - mds(i).length
      if (after > limit) {
        mds(i) = mds(i) ++ new Array[Byte](after - limit)
        after = limit
      }
      drift = after
    }
    val r = mds.flatten.toArray
    val out = new ArrayBuffer[Byte]()
    var capPrefix = 0
    var mdOffset = 0
    for (i <- frames.indices) {
      val mdb = capPrefix - mdOffset
      require(mdb >= 0 && mdb <= (if (lsf) 255 else 511) && mdb <= capPrefix,
        s"reservoir overflow at frame $i: mdb=$mdb")
      // header (no CRC): sync, version, layer III
      out += 0xFF.toByte
      out += (if (lsf) 0xF3 else 0xFB).toByte // ver bits + layer 01 + prot 1
      out += ((bri << 4) | (0 << 2) | (0 << 1)).toByte
      out += ((mode << 6) | (modeExt << 4)).toByte
      // side info
      val bw = new BW
      bw.w(mdb, if (lsf) 8 else 9)
      bw.w(0, if (lsf) { if (ch == 1) 1 else 2 } else { if (ch == 1) 5 else 3 })
      if (!lsf) for (c <- 0 until ch; grp <- 0 until 4)
        bw.w(frames(i).scfsi(c)(grp), 1)
      for (g <- 0 until nGr; c <- 0 until ch) {
        val gr = frames(i).gr(g)(c)
        bw.w(part23s(i)(g)(c), 12)
        bw.w(gr.bigValues, 9)
        bw.w(gr.globalGain, 8)
        bw.w(gr.sfCompress, if (lsf) 9 else 4)
        val wsw = if (gr.blockType != 0) 1 else 0
        bw.w(wsw, 1)
        if (wsw == 1) {
          bw.w(gr.blockType, 2)
          bw.w(if (gr.mixed) 1 else 0, 1)
          bw.w(gr.tableSelect(0), 5); bw.w(gr.tableSelect(1), 5)
          for (w <- 0 until 3) bw.w(gr.subblockGain(w), 3)
        } else {
          for (t <- 0 until 3) bw.w(gr.tableSelect(t), 5)
          bw.w(gr.region0, 4); bw.w(gr.region1, 3)
        }
        if (!lsf) bw.w(if (gr.preflag) 1 else 0, 1)
        bw.w(gr.sfScale, 1)
        bw.w(gr.count1Sel, 1)
      }
      bw.padToByte()
      val sb = bw.bytes
      require(sb.length == sideBytes, s"side info ${sb.length} != $sideBytes")
      out ++= sb
      // main region: next `cap` bytes of R (zero-padded at stream end)
      for (j <- 0 until cap) {
        val p = capPrefix + j
        out += (if (p < r.length) r(p) else 0)
      }
      capPrefix += cap
      mdOffset += mds(i).length
    }
    out.toArray
  }

  // ------------------------------------------------------------------
  // Independent reconstruction (direct-form everywhere)
  // ------------------------------------------------------------------
  /** Reference decode of the GRANULE DESCRIPTIONS (not the bits):
    * mirrors what a correct decoder must output, computed through
    * independently written DSP.
    */
  def refDecode(frames: Seq[Frame], lsf: Boolean = false, mode: Int = 3,
                modeExt: Int = 0): Array[Double] = {
    val ch = if (mode == 3) 1 else 2
    val nGr = if (lsf) 1 else 2
    val srIdx = 0
    val store = Array.fill(ch, 32, 18)(0.0)
    // synthesis history: last 16 S-vectors per channel, newest first
    val hist = Array.fill(ch)(ArrayBuffer.fill(16)(new Array[Double](32)))
    val out = new ArrayBuffer[Double]()
    val win = Mp3Synthesis.Window
    def synthDirect(c: Int, s: Array[Double]): Array[Double] = {
      hist(c).insert(0, s.clone)
      hist(c).remove(16)
      val o = new Array[Double](32)
      for (j <- 0 until 32) {
        var acc = 0.0
        for (m <- 0 until 16; k <- 0 until 32) {
          val n = 32 * m + j
          val phi = (if (k % 2 == 0) 1.0 else -1.0) * math.Pi / 4
          acc += hist(c)(m)(k) * win(n) *
            math.cos((2 * k + 1) * math.Pi / 64 * (n - 255.5) - phi)
        }
        o(j) = acc * Mp3Synthesis.Gain
      }
      o
    }
    for (f <- frames; g <- 0 until nGr) {
      val xs = Array.ofDim[Double](ch, 576)
      val rz = new Array[Int](ch)
      for (c <- 0 until ch) {
        val gr = f.gr(g)(c)
        refRequant(gr, lsf, srIdx, xs(c))
        // the decoder's zero-run start is structural: big-value pairs
        // plus count1 quadruples, whatever their values
        rz(c) = gr.bigValues * 2 + gr.count1 * 4
      }
      if (ch == 2) refStereo(f.gr(g)(0), f.gr(g)(1), lsf, srIdx, mode, modeExt, xs(0), xs(1), rz(1))
      val grOut = out.length
      for (_ <- 0 until 576) out += 0.0
      for (c <- 0 until ch) {
        val gr = f.gr(g)(c)
        refAlias(xs(c), gr)
        val sub = refImdct(xs(c), gr, store(c))
        // frequency inversion
        for (sb <- 0 until 32 if sb % 2 == 1; j <- 0 until 18 if j % 2 == 1)
          sub(sb)(j) = -sub(sb)(j)
        for (step <- 0 until 18) {
          val s = Array.tabulate(32)(k => sub(k)(step))
          val pcm = synthDirect(c, s)
          for (j <- 0 until 32) out(grOut + step * 32 + j) += pcm(j) / ch
        }
      }
    }
    out.toArray
  }

  /** Independent requantize + reorder. */
  private def refRequant(gr: Gr, lsf: Boolean, srIdx: Int, xr: Array[Double]): Unit = {
    val longTab = if (lsf) Mp3Decoder.SfbLongLsf(srIdx) else Mp3Decoder.SfbLong(srIdx)
    val shortTab = if (lsf) Mp3Decoder.SfbShortLsf(srIdx) else Mp3Decoder.SfbShort(srIdx)
    val mult = if (gr.sfScale == 0) 0.5 else 1.0
    def q(v: Int, exp: Double): Double =
      math.signum(v.toDouble) * math.pow(math.abs(v), 4.0 / 3.0) * math.pow(2.0, exp)
    val short = gr.blockType == 2
    val longEnd = if (!short) 576 else if (gr.mixed) 36 else 0
    for (i <- 0 until longEnd if gr.is(i) != 0) {
      // band = the largest b with longTab(b) <= i (boundaries are starts)
      val sfb = longTab.lastIndexWhere(_ <= i, 21)
      val pre = if (gr.preflag) Mp3Decoder.Pretab(sfb) else 0
      val sf = if (sfb < 21) gr.scfL(sfb) else 0
      xr(i) = q(gr.is(i), 0.25 * (gr.globalGain - 210) - mult * (sf + pre))
    }
    if (short) {
      val firstBand = if (gr.mixed) 3 else 0
      var src = longEnd
      for (sfb <- firstBand until 13; w <- 0 until 3; k <- 0 until shortTab(sfb + 1) - shortTab(sfb)) {
        if (src < 576) {
          if (gr.is(src) != 0) {
            val line = shortTab(sfb) + k
            val dst = (line / 6) * 18 + w * 6 + (line % 6)
            val sf = if (sfb < 12) gr.scfS(sfb)(w) else 0
            xr(dst) = q(gr.is(src),
              0.25 * (gr.globalGain - 210) - 2.0 * gr.subblockGain(w) - mult * sf)
          }
          src += 1
        }
      }
    }
    val lastNz = gr.is.lastIndexWhere(_ != 0)
    lastNz + 1
  }

  private def refStereo(grL: Gr, grR: Gr, lsf: Boolean, srIdx: Int, mode: Int,
                        modeExt: Int, l: Array[Double], r: Array[Double],
                        rzero: Int): Unit = {
    if (mode != 1) return
    val ms = (modeExt & 2) != 0
    val intensity = (modeExt & 1) != 0
    val inv = 1.0 / math.sqrt(2.0)
    if (!intensity) {
      if (ms) for (i <- 0 until 576) {
        val m = l(i); val s = r(i); l(i) = (m + s) * inv; r(i) = (m - s) * inv
      }
      return
    }
    val longTab = Mp3Decoder.SfbLong(srIdx)
    val shortTab = Mp3Decoder.SfbShort(srIdx)
    def msAt(i: Int): Unit = {
      val m = l(i); val s = r(i); l(i) = (m + s) * inv; r(i) = (m - s) * inv
    }
    def isAt(i: Int, isPos: Int): Unit =
      if (isPos != 7) {
        val ratio = math.tan(isPos * math.Pi / 12)
        val v = l(i); l(i) = v * ratio / (1 + ratio); r(i) = v / (1 + ratio)
      } else if (ms) msAt(i)
    // independent mirror of the decoder's (advice-r16-extended)
    // geometry: the zone rounds UP to the band containing rzero, runs
    // through the FINAL band (21 long / 12 short) with the last
    // transmitted band's is_pos, and a mixed block whose zone starts
    // below line 36 takes the long-band path for bands 0-7
    def shortZone(firstBand: Int, rz: Int): Unit = {
      val startBand = (firstBand until 13).find(b => shortTab(b) * 3 >= rz).getOrElse(13)
      for (line <- shortTab(firstBand) until shortTab(startBand); w <- 0 until 3) {
        val idx = (line / 6) * 18 + w * 6 + (line % 6)
        if (ms && idx < 576) msAt(idx)
      }
      for (band <- startBand until 13; w <- 0 until 3;
           k <- 0 until shortTab(band + 1) - shortTab(band)) {
        val line = shortTab(band) + k
        val idx = (line / 6) * 18 + w * 6 + (line % 6)
        if (idx < 576) isAt(idx, grR.scfS(math.min(band, 11))(w))
      }
    }
    def longZone(from: Int, until: Int, rz: Int): Unit = {
      val startBand = (from until until).find(sfb => longTab(sfb) >= rz).getOrElse(until)
      for (i <- longTab(from) until longTab(startBand)) if (ms) msAt(i)
      for (sfb <- startBand until until; i <- longTab(sfb) until longTab(sfb + 1))
        isAt(i, grR.scfL(math.min(sfb, 20)))
    }
    if (grL.blockType != 2) longZone(0, 22, rzero)
    else if (grL.mixed && rzero < 36) { longZone(0, 8, rzero); shortZone(3, 0) }
    else {
      val firstBand = if (grL.mixed) 3 else 0
      if (grL.mixed && ms) for (i <- 0 until 36) msAt(i)
      shortZone(firstBand, rzero)
    }
  }

  private def refAlias(xr: Array[Double], gr: Gr): Unit = {
    if (gr.blockType == 2 && !gr.mixed) return
    val lim = if (gr.blockType == 2) 2 else 32
    for (sb <- 1 until lim; i <- 0 until 8) {
      val ci = Mp3Decoder.AliasCi(i)
      val cs = 1.0 / math.sqrt(1 + ci * ci)
      val ca = ci / math.sqrt(1 + ci * ci)
      val u = xr(18 * sb - 1 - i); val d = xr(18 * sb + i)
      xr(18 * sb - 1 - i) = u * cs - d * ca
      xr(18 * sb + i) = d * cs + u * ca
    }
  }

  /** Independent IMDCT + window + overlap-add; returns 32x18 subband
    * time samples for the granule.
    */
  private def refImdct(xr: Array[Double], gr: Gr,
                       store: Array[Array[Double]]): Array[Array[Double]] = {
    val out = Array.ofDim[Double](32, 18)
    for (sb <- 0 until 32) {
      val bt = if (gr.blockType == 2 && (!gr.mixed || sb >= 2)) 2
               else if (gr.blockType == 2) 0
               else gr.blockType
      val raw = new Array[Double](36)
      if (bt == 2) {
        for (w <- 0 until 3; i <- 0 until 12) {
          var acc = 0.0
          for (k <- 0 until 6)
            acc += xr(sb * 18 + w * 6 + k) * math.cos(math.Pi / 24 * (2 * i + 7) * (2 * k + 1))
          raw(6 + 6 * w + i) += acc * math.sin(math.Pi / 12 * (i + 0.5))
        }
      } else {
        for (i <- 0 until 36) {
          var acc = 0.0
          for (k <- 0 until 18)
            acc += xr(sb * 18 + k) * math.cos(math.Pi / 72 * (2 * i + 19) * (2 * k + 1))
          val w = bt match {
            case 1 => if (i < 18) math.sin(math.Pi / 36 * (i + 0.5))
                      else if (i < 24) 1.0
                      else if (i < 30) math.sin(math.Pi / 12 * (i - 17.5))
                      else 0.0
            case 3 => if (i < 6) 0.0
                      else if (i < 12) math.sin(math.Pi / 12 * (i - 5.5))
                      else if (i < 18) 1.0
                      else math.sin(math.Pi / 36 * (i + 0.5))
            case _ => math.sin(math.Pi / 36 * (i + 0.5))
          }
          raw(i) = acc * w
        }
      }
      for (j <- 0 until 18) {
        out(sb)(j) = raw(j) + store(sb)(j)
        store(sb)(j) = raw(j + 18)
      }
    }
    out
  }

  // ------------------------------------------------------------------
  // Real-audio path: PCM -> analysis -> MDCT -> quantize -> Gr specs
  // ------------------------------------------------------------------
  /** Analyze PCM into granules of 32x18 subband samples using a
    * direct-form (unfolded) analysis bank — the product's folded
    * [[Mp3Synthesis.analysisStep]] twin.
    */
  def analyze(pcm: Array[Double], granules: Int): Array[Array[Array[Double]]] = {
    val win = Mp3Synthesis.Window
    val out = Array.ofDim[Double](granules, 32, 18)
    for (g <- 0 until granules; step <- 0 until 18) {
      val t = g * 18 + step // slice index; newest sample = pcm(32t+511)
      for (k <- 0 until 32) {
        var acc = 0.0
        val phi = (if (k % 2 == 0) 1.0 else -1.0) * math.Pi / 4
        for (n <- 0 until 512) {
          val x = pcm(32 * t + 511 - n)
          acc += x * win(n) * math.cos((2 * k + 1) * math.Pi / 64 * (n - 255.5) + phi)
        }
        out(g)(k)(step) = acc
      }
    }
    out
  }

  /** Forward MDCT (long blocks; 1/9 TDAC normalization — the exact
    * inverse of the decoder's spec-formula IMDCT + overlap-add, see
    * Mp3Spec's MDCT round-trip pin) + frequency inversion + mid-tread
    * quantization against `globalGain`. Returns per-granule spectra.
    */
  def mdctQuantize(sub: Array[Array[Array[Double]]],
                   globalGain: Int): Array[Array[Int]] = {
    val g2 = math.pow(2.0, 0.25 * (globalGain - 210))
    val granules = sub.length - 1 // last granule is lookahead
    val out = Array.ofDim[Int](granules, 576)
    val xspec = Array.ofDim[Double](granules, 576)
    for (g <- 0 until granules; sb <- 0 until 32) {
      val blk = new Array[Double](36)
      for (i <- 0 until 18) {
        blk(i) = sub(g)(sb)(i)
        blk(18 + i) = sub(g + 1)(sb)(i)
      }
      // mirror the decoder's frequency inversion (odd sb, odd sample)
      if (sb % 2 == 1) for (i <- 0 until 36 if (i % 2) == 1) blk(i) = -blk(i)
      for (k <- 0 until 18) {
        var acc = 0.0
        for (i <- 0 until 36)
          acc += blk(i) * math.sin(math.Pi / 36 * (i + 0.5)) *
            math.cos(math.Pi / 72 * (2 * i + 19) * (2 * k + 1))
        xspec(g)(sb * 18 + k) = acc / 9.0
      }
    }
    // the decoder WILL run the alias-reduction butterflies, so the
    // encoder must pre-apply their inverse (cs^2 + ca^2 = 1 rotation:
    // inverse swaps the ca signs) — without this the decode injects
    // inter-subband aliasing at the butterfly magnitude (~34 dB floor,
    // measured before this block existed)
    for (g <- 0 until granules; sb <- 1 until 32; i <- 0 until 8) {
      val ci = graft.operators.multimodal.Mp3Decoder.AliasCi(i)
      val cs = 1.0 / math.sqrt(1 + ci * ci)
      val ca = ci / math.sqrt(1 + ci * ci)
      val u = xspec(g)(18 * sb - 1 - i); val d = xspec(g)(18 * sb + i)
      xspec(g)(18 * sb - 1 - i) = u * cs + d * ca
      xspec(g)(18 * sb + i) = d * cs - u * ca
    }
    for (g <- 0 until granules; j <- 0 until 576) {
      val xk = xspec(g)(j)
      // invert |is|^(4/3) * g2: is = round(sign * (|x|/g2)^(3/4))
      val mag = math.pow(math.abs(xk) / g2, 0.75)
      out(g)(j) = (math.signum(xk) * math.rint(mag)).toInt
    }
    out
  }
}
