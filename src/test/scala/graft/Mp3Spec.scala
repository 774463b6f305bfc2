package graft

import graft.operators.multimodal.{AudioDecoder, Mp3Decoder, Mp3Synthesis}
import Mp3Decoder.{Bits, HuffTable, Mp3Tables}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** MPEG-1/2 Layer III decode (SURVEY §2 #36d, round 16). Pins, per the
  * decoder scaladoc's epistemic inventory: Huffman structural laws,
  * SFB/slen/alias table laws, the near-PR synthesis law (with the
  * single-tap falsifier), decode ≡ independent reconstruction fuzz
  * (the [[AdpcmTestEncoder]] discipline), the reservoir-equivalence
  * property, the real foreign LAME stream, loud degradation on
  * uncarried tables, and routing/corruption totality.
  */
class Mp3Spec extends AnyFunSuite {
  import Mp3Fixture._

  private val TrustedIds = Seq(1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12)
  private def trusted(id: Int): HuffTable = Mp3Tables.BigValue(id)
  /** per-table max |value| encodable without linbits */
  private def maxAbs(id: Int): Int = trusted(id).lens.length / trusted(id).ylen - 1

  // ------------------------------------------------------------------
  // Table laws
  // ------------------------------------------------------------------
  test("huffman tables: exact Kraft completeness, prefix-freeness, in-range codes") {
    val all: Seq[(String, HuffTable)] =
      TrustedIds.map(i => s"t$i" -> trusted(i)) ++
        Seq("count1A" -> Mp3Tables.Count1A, "count1B" -> Mp3Tables.Count1B)
    for ((name, t) <- all) {
      // Kraft sum as exact integer at 2^-24 scale
      val kraft = t.lens.map(l => 1L << (24 - l)).sum
      assert(kraft == (1L << 24), s"$name: Kraft sum ${kraft.toDouble / (1 << 24)}")
      val strings = t.lens.indices.map { e =>
        assert(t.codes(e) >= 0 && t.codes(e) < (1 << t.lens(e)), s"$name entry $e out of range")
        String.format(s"%${t.lens(e)}s", t.codes(e).toBinaryString).replace(' ', '0')
      }
      assert(strings.distinct.size == strings.size, s"$name: duplicate codes")
      val sorted = strings.sorted
      for ((a, b) <- sorted.zip(sorted.tail))
        assert(!b.startsWith(a), s"$name: $a prefixes $b")
    }
    // count1 table B is the 4-bit complement code
    assert(Mp3Tables.Count1B.lens.forall(_ == 4))
    assert(Mp3Tables.Count1B.codes.toSeq == (0 until 16).map(15 - _))
  }

  test("sfb tables: 0-start, 576/192-end, strictly increasing, width growth") {
    // MPEG-1 tables grow monotonically to the last band; the LSF
    // tables cover a lower Nyquist with the same 576/192 lines, so
    // their final bands are clamped remainders and may NARROW — the
    // growth law holds over the Bark-spaced head (the exemption is the
    // tail, never an interior wiggle)
    def growthHolds(w: Seq[Int], exemptTail: Int): Unit = {
      val head = w.dropRight(exemptTail)
      assert(head.zip(head.tail).forall { case (a, b) => b >= a },
        s"widths decrease before the tail: $w")
    }
    // (the 32 kHz MPEG-1 table also ends in a clamped remainder band —
    // 576 lines cover the full 16 kHz Nyquist — hence tail 1 for v1)
    for ((t, lsf) <- Mp3Decoder.SfbLong.map((_, false)) ++ Mp3Decoder.SfbLongLsf.map((_, true))) {
      assert(t.length == 23 && t.head == 0 && t.last == 576)
      val w = t.zip(t.tail).map { case (a, b) => b - a }
      assert(w.forall(_ > 0))
      growthHolds(w.toSeq, if (lsf) 2 else 1)
    }
    for (t <- Mp3Decoder.SfbShort ++ Mp3Decoder.SfbShortLsf) {
      assert(t.length == 14 && t.head == 0 && t.last == 192)
      val w = t.zip(t.tail).map { case (a, b) => b - a }
      assert(w.forall(_ > 0))
      // 32 kHz v1 clamps at Nyquist exactly like the LSF tables
      growthHolds(w.toSeq, 1)
    }
    assert(Mp3Decoder.Pretab.length == 22 && Mp3Decoder.Pretab.max == 3 &&
      Mp3Decoder.Pretab.take(11).forall(_ == 0))
    // slen pairs: 4 bits of scalefac_compress must cover exactly 16 pairs
    assert(Mp3Decoder.Slen.length == 16)
    assert(Mp3Decoder.Slen.forall { case (a, b) => a <= 4 && b <= 3 })
    // LSF group counts must sum to the scalefactor count of their shape
    for (block <- Mp3Decoder.LsfNrSfb) {
      assert(block(0).sum == 21) // long
      assert(block(1).sum == 36) // short (12 bands x 3 windows)
      assert(block(2).sum == 33) // mixed (6 long + 9x3 short)
    }
  }

  test("alias coefficients: magnitude-decaying ci, cs^2 + ca^2 = 1 by construction") {
    val ci = Mp3Decoder.AliasCi
    assert(ci.length == 8)
    assert(ci.forall(_ < 0))
    for (i <- 0 until 7) assert(math.abs(ci(i)) > math.abs(ci(i + 1)))
    for (c <- ci) {
      val cs = 1.0 / math.sqrt(1 + c * c); val ca = c / math.sqrt(1 + c * c)
      assert(math.abs(cs * cs + ca * ca - 1.0) < 1e-15)
    }
  }

  // ------------------------------------------------------------------
  // Synthesis filterbank laws
  // ------------------------------------------------------------------
  /** Direct-form round-trip with an arbitrary window (the law must
    * hold for the shipped table and FAIL for a perturbed copy).
    */
  private def roundtripSnr(win: Array[Double], seed: Long): (Double, Double) = {
    val rng = new scala.util.Random(seed)
    val n = 512 + 32 * 80
    val x = Array.fill(n)(rng.nextGaussian())
    val steps = (n - 512) / 32
    val hist = ArrayBuffer.fill(16)(new Array[Double](32))
    val out = new Array[Double](steps * 32)
    for (t <- 0 until steps) {
      val s = new Array[Double](32)
      for (k <- 0 until 32) {
        val phi = (if (k % 2 == 0) 1.0 else -1.0) * math.Pi / 4
        var acc = 0.0
        for (m <- 0 until 512)
          acc += x(32 * t + 511 - m) * win(m) *
            math.cos((2 * k + 1) * math.Pi / 64 * (m - 255.5) + phi)
        s(k) = acc
      }
      hist.insert(0, s); hist.remove(16)
      for (j <- 0 until 32) {
        var acc = 0.0
        for (m <- 0 until 16; k <- 0 until 32) {
          val idx = 32 * m + j
          val phi = (if (k % 2 == 0) 1.0 else -1.0) * math.Pi / 4
          acc += hist(m)(k) * win(idx) *
            math.cos((2 * k + 1) * math.Pi / 64 * (idx - 255.5) - phi)
        }
        out(32 * t + j) = acc * Mp3Synthesis.Gain
      }
    }
    val ya = out.slice(700, steps * 32 - 64)
    val xa = x.slice(700, steps * 32 - 64)
    val g = ya.zip(xa).map { case (a, b) => a * b }.sum / xa.map(v => v * v).sum
    val err = ya.zip(xa).map { case (a, b) => a - g * b }
    val snr = 10 * math.log10(ya.map(v => v * v).sum / err.map(v => v * v).sum)
    (snr, g)
  }

  test("synthesis window: near-PR law holds (>= 90 dB, unit gain); a single perturbed tap collapses it") {
    val (snr, g) = roundtripSnr(Mp3Synthesis.Window, 20260816L)
    info(f"roundtrip SNR $snr%.1f dB, gain $g%.6f")
    assert(snr > 90, s"near-PR violated: $snr dB")
    assert(math.abs(g - 1.0) < 1e-3, s"composite gain drifted: $g")
    val bad = Mp3Synthesis.Window.clone()
    bad(100) += 1e-3
    val (snrBad, _) = roundtripSnr(bad, 20260816L)
    info(f"perturbed-tap SNR $snrBad%.1f dB")
    assert(snrBad < snr - 30, s"window law is not single-tap sensitive: $snrBad vs $snr")
    // symmetry (the table stores half; the law-bearing object is full)
    for (n <- 0 until 256) assert(Mp3Synthesis.Window(n) == Mp3Synthesis.Window(511 - n))
  }

  test("product folded analysis/synthesis match the direct forms") {
    val rng = new scala.util.Random(7L)
    // analysis: folded (product) vs direct 512-tap sum
    val newestFirst = Array.fill(512)(rng.nextGaussian())
    val folded = new Array[Double](32)
    Mp3Synthesis.analysisStep(newestFirst, folded)
    for (k <- 0 until 32) {
      val phi = (if (k % 2 == 0) 1.0 else -1.0) * math.Pi / 4
      var acc = 0.0
      for (m <- 0 until 512)
        acc += newestFirst(m) * Mp3Synthesis.Window(m) *
          math.cos((2 * k + 1) * math.Pi / 64 * (m - 255.5) + phi)
      assert(math.abs(folded(k) - acc) < 1e-9, s"analysis fold mismatch at band $k")
    }
    // synthesis: FIFO (product) vs direct history sum over 20 steps
    val st = new Mp3Decoder.ChannelState
    val hist = ArrayBuffer.fill(16)(new Array[Double](32))
    for (step <- 0 until 20) {
      val s = Array.fill(32)(rng.nextGaussian())
      val out = new Array[Double](32)
      Mp3Decoder.synthesisStep(st, s, out, 0)
      hist.insert(0, s.clone); hist.remove(16)
      for (j <- 0 until 32) {
        var acc = 0.0
        for (m <- 0 until 16; k <- 0 until 32) {
          val idx = 32 * m + j
          val phi = (if (k % 2 == 0) 1.0 else -1.0) * math.Pi / 4
          acc += hist(m)(k) * Mp3Synthesis.Window(idx) *
            math.cos((2 * k + 1) * math.Pi / 64 * (idx - 255.5) - phi)
        }
        acc *= Mp3Synthesis.Gain
        assert(math.abs(out(j) - acc) < 1e-9, s"synthesis FIFO mismatch step $step j $j")
      }
    }
  }

  // ------------------------------------------------------------------
  // Granule fuzz: decode == independent reconstruction
  // ------------------------------------------------------------------
  private def randomGr(rng: scala.util.Random, stereoBudget: Boolean,
                       lsf: Boolean, forceType: Option[Int] = None,
                       forceMixed: Boolean = false): Gr = {
    // forceType exists because the region->table mapping depends on the
    // block type: spectra generated for one shape can exceed another
    // shape's per-region table range, so tests that need a fixed shape
    // must force it BEFORE the values are drawn, never via .copy after
    val blockType = forceType.getOrElse(Seq(0, 0, 0, 1, 2, 2, 3)(rng.nextInt(7)))
    val mixed = blockType == 2 && (forceMixed || (forceType.isEmpty && rng.nextBoolean()))
    val sfc = if (lsf) rng.nextInt(400) else rng.nextInt(16)
    // slen caps for generated scalefactors
    val (s1, s2) =
      if (!lsf) Mp3Decoder.Slen(sfc)
      else { val a = (sfc >> 4) / 5; val b = (sfc >> 4) % 5; (a, b) } // caps via min below
    val capL = (sfb: Int) => if (sfb < 11) (1 << s1) - 1 else (1 << s2) - 1
    val gr0 = Gr(
      is = new Array[Int](576),
      scfL = Array.tabulate(21)(sfb => rng.nextInt(1 + math.min(capL(sfb), 7))),
      scfS = Array.fill(12)(Array.fill(3)(rng.nextInt(1 + math.min((1 << math.min(s1, s2)) - 1, 7)))),
      globalGain = 140 + rng.nextInt(80),
      sfCompress = sfc,
      blockType = blockType, mixed = mixed,
      tableSelect = Array.fill(3)(TrustedIds(rng.nextInt(TrustedIds.length))),
      subblockGain = Array.fill(3)(rng.nextInt(3)),
      region0 = rng.nextInt(9), region1 = rng.nextInt(4),
      preflag = !lsf && rng.nextBoolean(),
      sfScale = rng.nextInt(2),
      count1Sel = rng.nextInt(2),
      bigValues = 0, count1 = 0)
    // LSF scalefac caps depend on the 4-group decomposition; clamp to
    // the smallest group's cap so every band fits its slen
    val gr = if (!lsf) gr0 else {
      val slen = new Array[Int](4)
      if (sfc < 400) { slen(0) = (sfc >> 4) / 5; slen(1) = (sfc >> 4) % 5; slen(2) = (sfc % 16) >> 2; slen(3) = sfc % 4 }
      val cap = (1 << slen.min) - 1
      gr0.copy(scfL = gr0.scfL.map(v => math.min(v, cap)),
        scfS = gr0.scfS.map(_.map(v => math.min(v, cap))))
    }
    // spectrum: per-region table max
    val budget = if (stereoBudget) 30 else 60
    val bigValues = rng.nextInt(budget)
    val count1 = rng.nextInt(16)
    val longTab = if (lsf) Mp3Decoder.SfbLongLsf(0) else Mp3Decoder.SfbLong(0)
    val shortTab = if (lsf) Mp3Decoder.SfbShortLsf(0) else Mp3Decoder.SfbShort(0)
    val (r1, r2) =
      if (blockType != 0)
        (if (blockType == 2 && !mixed) 3 * shortTab(3) else longTab(8), 576)
      else (longTab(gr.region0 + 1), longTab(math.min(gr.region0 + gr.region1 + 2, 22)))
    val is = new Array[Int](576)
    for (i <- 0 until bigValues * 2) {
      val sel = if (i < r1) gr.tableSelect(0) else if (i < r2) gr.tableSelect(1) else gr.tableSelect(2)
      val m = maxAbs(sel)
      is(i) = rng.nextInt(2 * m + 1) - m
    }
    for (i <- bigValues * 2 until bigValues * 2 + count1 * 4)
      is(i) = rng.nextInt(3) - 1
    gr.copy(is = is, bigValues = bigValues, count1 = count1)
  }

  private def assertClose(got: Array[Double], want: Array[Double], what: String): Unit = {
    assert(got.length == want.length, s"$what: length ${got.length} vs ${want.length}")
    val scale = 1.0 + want.map(math.abs).max
    var worst = 0.0
    for (i <- got.indices) worst = math.max(worst, math.abs(got(i) - want(i)))
    assert(worst <= 1e-9 * scale, s"$what: max diff $worst (scale $scale)")
  }

  test("fuzz: mono MPEG-1 decode is the independent reconstruction, all block types") {
    val rng = new scala.util.Random(20260816L)
    for (iter <- 1 to 25) {
      val frames = Seq.fill(2 + rng.nextInt(3))(
        Frame(Array(Array(randomGr(rng, stereoBudget = false, lsf = false)),
                    Array(randomGr(rng, stereoBudget = false, lsf = false)))))
      val bytes = encode(frames)
      val got = Mp3Decoder.decode(bytes).getOrElse(fail(s"iter $iter: no decode"))
      val want = refDecode(frames)
      assertClose(got, want, s"iter $iter")
    }
  }

  test("fuzz: stereo MS and plain stereo match the reconstruction") {
    val rng = new scala.util.Random(20260817L)
    for (iter <- 1 to 12) {
      val mode = Seq(0, 1, 2)(rng.nextInt(3)) // stereo / joint / dual
      val modeExt = if (mode == 1) 2 else 0   // MS only (intensity below)
      def g() = randomGr(rng, stereoBudget = true, lsf = false)
      val frames = Seq.fill(2)(Frame(Array(Array(g(), g()), Array(g(), g()))))
      val bytes = encode(frames, mode = mode, modeExt = modeExt)
      val got = Mp3Decoder.decode(bytes).getOrElse(fail(s"iter $iter: no decode"))
      val want = refDecode(frames, mode = mode, modeExt = modeExt)
      assertClose(got, want, s"iter $iter mode=$mode")
    }
  }

  test("intensity stereo (MPEG-1, long blocks): zone follows the right channel's zero run") {
    val rng = new scala.util.Random(20260818L)
    for (iter <- 1 to 8; withMs <- Seq(false, true)) {
      // left: full-width spectrum; right: zero above its big-value zone
      def left() = randomGr(rng, stereoBudget = true, lsf = false, forceType = Some(0))
      def right() = { // sfCompress 13 = (3,3): every is_pos 0..6 fits its slen
        val g = randomGr(rng, stereoBudget = true, lsf = false, forceType = Some(0))
        val is = g.is.clone()
        java.util.Arrays.fill(is, g.bigValues * 2, 576, 0)
        g.copy(is = is, count1 = 0, sfCompress = 13,
          scfL = Array.tabulate(21)(_ => rng.nextInt(7))) // is_pos 0..6 (7 = off)
      }
      val frames = Seq(Frame(Array(Array(left(), right()), Array(left(), right()))))
      val modeExt = (if (withMs) 2 else 0) | 1
      val bytes = encode(frames, mode = 1, modeExt = modeExt)
      val got = Mp3Decoder.decode(bytes).getOrElse(fail(s"iter $iter: no decode"))
      val want = refDecode(frames, mode = 1, modeExt = modeExt)
      assertClose(got, want, s"iter $iter ms=$withMs")
    }
  }

  test("intensity stereo on SHORT blocks: per-window is_pos in the reordered layout") {
    val rng = new scala.util.Random(20260826L)
    for (iter <- 1 to 8; withMs <- Seq(false, true)) {
      def left() = randomGr(rng, stereoBudget = true, lsf = false, forceType = Some(2))
      def right() = { // short scalefacs as is_pos 0..6; sfCompress 13 fits them
        val g = randomGr(rng, stereoBudget = true, lsf = false, forceType = Some(2))
        val is = g.is.clone()
        java.util.Arrays.fill(is, g.bigValues * 2, 576, 0)
        g.copy(is = is, count1 = 0, sfCompress = 13,
          scfS = Array.fill(12)(Array.tabulate(3)(_ => rng.nextInt(7))))
      }
      val frames = Seq(Frame(Array(Array(left(), right()), Array(left(), right()))))
      val modeExt = (if (withMs) 2 else 0) | 1
      val bytes = encode(frames, mode = 1, modeExt = modeExt)
      val got = Mp3Decoder.decode(bytes).getOrElse(fail(s"iter $iter: no decode"))
      val want = refDecode(frames, mode = 1, modeExt = modeExt)
      assertClose(got, want, s"iter $iter ms=$withMs short")
    }
  }

  test("LSF window-switching: big-values region boundary follows the band sequence, not the 36 literal") {
    // Independent statement of the boundary (advice-r16): the implicit
    // region0_count covers 8 bands of the ACTIVE sequence. At
    // 22.05 kHz (srIdx 0) the LSF long table reads
    // 0,6,12,18,24,30,36,44,54,... — start/stop and mixed blocks
    // switch tables at line 54; short non-mixed at 3*12 = 36. These
    // literals are computed here from the band tables, not taken from
    // the decoder's region logic.
    assert(Mp3Decoder.SfbLongLsf(0)(8) == 54)
    assert(3 * Mp3Decoder.SfbShortLsf(0)(3) == 36)
    val rng = new scala.util.Random(20260827L)
    for (bt <- Seq(1, 3); iter <- 1 to 4) {
      // values at lines 36..53 only fit tableSelect(0)'s range: a
      // decoder still using the 36 literal reads them with
      // tableSelect(1) (max |v| 1) and desyncs the Huffman walk
      val is = new Array[Int](576)
      for (i <- 0 until 54) is(i) = rng.nextInt(11) - 5   // |v| <= 5: table 7
      for (i <- 54 until 60) is(i) = rng.nextInt(3) - 1   // |v| <= 1: table 1
      is(40) = 5 // at least one line in (36, 54) pinned out of table 1's range
      val g = randomGr(rng, stereoBudget = false, lsf = true, forceType = Some(bt))
        .copy(is = is, bigValues = 30, count1 = 0, tableSelect = Array(7, 1, 1))
      val frames = Seq(Frame(Array(Array(g))))
      val bytes = encode(frames, lsf = true)
      val got = Mp3Decoder.decode(bytes).getOrElse(fail(s"bt=$bt iter $iter: no decode"))
      assertClose(got, refDecode(frames, lsf = true), s"bt=$bt iter $iter")
    }
    // LSF mixed short blocks resolve through the long table too
    for (iter <- 1 to 4) {
      val is = new Array[Int](576)
      for (i <- 0 until 54) is(i) = rng.nextInt(11) - 5
      is(40) = 5
      val g = randomGr(rng, stereoBudget = false, lsf = true, forceType = Some(2),
        forceMixed = true)
        .copy(is = is, bigValues = 27, count1 = 0, tableSelect = Array(7, 1, 1))
      val frames = Seq(Frame(Array(Array(g))))
      val bytes = encode(frames, lsf = true)
      val got = Mp3Decoder.decode(bytes).getOrElse(fail(s"mixed iter $iter: no decode"))
      assertClose(got, refDecode(frames, lsf = true), s"mixed iter $iter")
    }
  }

  test("intensity stereo on MIXED blocks: a zone starting in the long region takes the long-band path") {
    val rng = new scala.util.Random(20260828L)
    for (iter <- 1 to 8; withMs <- Seq(false, true)) {
      def left() = randomGr(rng, stereoBudget = true, lsf = false,
        forceType = Some(2), forceMixed = true)
      // right channel: zero above a SMALL big-value zone so rzero
      // lands inside the long region (< 36) on some iterations and
      // inside the short region on others; is_pos values include 7
      // (= off / MS) to exercise both zone arms
      def right() = {
        val g = randomGr(rng, stereoBudget = true, lsf = false,
          forceType = Some(2), forceMixed = true)
        val bv = rng.nextInt(30)
        val is = g.is.clone()
        java.util.Arrays.fill(is, bv * 2, 576, 0)
        g.copy(is = is, bigValues = bv, count1 = 0, sfCompress = 13,
          scfL = Array.tabulate(21)(_ => rng.nextInt(8)),
          scfS = Array.fill(12)(Array.tabulate(3)(_ => rng.nextInt(8))))
      }
      val frames = Seq(Frame(Array(Array(left(), right()), Array(left(), right()))))
      val modeExt = (if (withMs) 2 else 0) | 1
      val bytes = encode(frames, mode = 1, modeExt = modeExt)
      val got = Mp3Decoder.decode(bytes).getOrElse(fail(s"iter $iter: no decode"))
      val want = refDecode(frames, mode = 1, modeExt = modeExt)
      assertClose(got, want, s"iter $iter ms=$withMs mixed")
    }
  }

  test("intensity zone reaches the FINAL band: the tail reuses the last transmitted is_pos") {
    val rng = new scala.util.Random(20260829L)
    for (iter <- 1 to 4; withMs <- Seq(false, true); short <- Seq(false, true)) {
      val bt = Some(if (short) 2 else 0)
      // left: nonzero lines all the way into band 21 / short band 12
      // (bigValues = 288 pairs of |v| <= 1 through table 1) so the
      // tail rule has energy to act on
      def left() = randomGr(rng, stereoBudget = true, lsf = false, forceType = bt)
        .copy(is = Array.tabulate(576)(_ => rng.nextInt(3) - 1),
          bigValues = 288, count1 = 0, tableSelect = Array(1, 1, 1))
      // right: zero spectrum (zone = everything); is_pos includes 7 so
      // the is_pos==7-with-MS tail arm (the advice-r16 sqrt(2) case)
      // is hit
      def right() = randomGr(rng, stereoBudget = true, lsf = false, forceType = bt)
        .copy(is = new Array[Int](576), bigValues = 0, count1 = 0, sfCompress = 13,
          tableSelect = Array(1, 1, 1),
          scfL = Array.tabulate(21)(_ => rng.nextInt(8)),
          scfS = Array.fill(12)(Array.tabulate(3)(_ => rng.nextInt(8))))
      val frames = Seq(Frame(Array(Array(left(), right()), Array(left(), right()))))
      val modeExt = (if (withMs) 2 else 0) | 1
      val bytes = encode(frames, mode = 1, modeExt = modeExt)
      val got = Mp3Decoder.decode(bytes).getOrElse(fail(s"iter $iter: no decode"))
      val want = refDecode(frames, mode = 1, modeExt = modeExt)
      assertClose(got, want, s"iter $iter ms=$withMs short=$short tail")
    }
  }

  test("scfsi: granule-1 groups copied from granule 0 decode identically") {
    val rng = new scala.util.Random(20260819L)
    for (iter <- 1 to 6) {
      val g0 = randomGr(rng, stereoBudget = false, lsf = false, forceType = Some(0))
      val (s1, s2) = Mp3Decoder.Slen(g0.sfCompress)
      val g1base = randomGr(rng, stereoBudget = false, lsf = false, forceType = Some(0))
        .copy(sfCompress = g0.sfCompress,
          // regenerate under granule 0's slen caps (the copy changed them)
          scfL = Array.tabulate(21)(sfb =>
            rng.nextInt(1 << (if (sfb < 11) s1 else s2))))
      val scfsi = Array.tabulate(4)(_ => rng.nextInt(2))
      val groups = Array((0, 6), (6, 11), (11, 16), (16, 21))
      val scf1 = g1base.scfL.clone()
      for (grp <- 0 until 4 if scfsi(grp) == 1; sfb <- groups(grp)._1 until groups(grp)._2)
        scf1(sfb) = g0.scfL(sfb)
      val g1 = g1base.copy(scfL = scf1)
      val frames = Seq(Frame(Array(Array(g0), Array(g1)), Array(scfsi, new Array[Int](4))))
      val bytes = encode(frames)
      val got = Mp3Decoder.decode(bytes).getOrElse(fail(s"iter $iter: no decode"))
      val want = refDecode(frames)
      assertClose(got, want, s"iter $iter scfsi=${scfsi.toSeq}")
    }
  }

  test("bit reservoir: a tight-packed stream (mdb > 0) decodes exactly like its padded mdb=0 twin") {
    val rng = new scala.util.Random(20260820L)
    val frames = Seq.fill(5)(
      Frame(Array(Array(randomGr(rng, stereoBudget = true, lsf = false)),
                  Array(randomGr(rng, stereoBudget = true, lsf = false)))))
    val tight = encode(frames) // reservoir packs forward, mdb > 0 appears
    // padded twin: fill each frame's md to one fixed size so every
    // frame is self-contained (mdb = 0 everywhere)
    val padded = encode(frames, padMd = _ => 200)
    // confirm the streams really differ in packing
    assert(!java.util.Arrays.equals(tight, padded))
    val a = Mp3Decoder.decode(tight).getOrElse(fail("tight: no decode"))
    val b = Mp3Decoder.decode(padded).getOrElse(fail("padded: no decode"))
    assertClose(a, b, "reservoir equivalence")
    assertClose(a, refDecode(frames), "reservoir vs reconstruction")
  }

  test("fuzz: LSF (MPEG-2) mono frames match the reconstruction") {
    val rng = new scala.util.Random(20260821L)
    for (iter <- 1 to 12) {
      val frames = Seq.fill(3)(Frame(Array(Array(randomGr(rng, stereoBudget = false, lsf = true)))))
      val bytes = encode(frames, lsf = true)
      val got = Mp3Decoder.decode(bytes).getOrElse(fail(s"iter $iter: no decode"))
      val want = refDecode(frames, lsf = true)
      assertClose(got, want, s"iter $iter")
    }
  }

  // ------------------------------------------------------------------
  // Real-audio end-to-end and the linbits engine
  // ------------------------------------------------------------------
  /** Build granule specs from PCM through the real analysis+MDCT path. */
  private def encodeTone(pcm: Array[Double], granules: Int, gg: Int,
                         tsel: Int): Seq[Frame] = {
    val sub = Mp3Fixture.analyze(pcm, granules + 1)
    val is = Mp3Fixture.mdctQuantize(sub, gg)
    val grs = is.map { spec =>
      // find last |v|>1 (big-value region; count1 left empty for clarity)
      val lastBig = spec.lastIndexWhere(v => v != 0)
      val bigValues = if (lastBig < 0) 0 else (lastBig / 2) + 1
      Gr(is = spec, globalGain = gg, tableSelect = Array(tsel, tsel, tsel),
        region0 = 4, region1 = 10, bigValues = bigValues, count1 = 0)
    }
    grs.grouped(2).filter(_.length == 2)
      .map(p => Frame(Array(Array(p(0)), Array(p(1))))).toSeq
  }

  test("end-to-end PCM tone through the public decode survives the trusted-table quantizer") {
    val granules = 8
    val n = 512 + 32 * 18 * (granules + 1)
    val pcm = Array.tabulate(n)(i => 0.4 * math.sin(2 * math.Pi * 441.0 / 44100.0 * i))
    // coarse quantizer: values fit table 12 (|v| <= 7)
    val frames = encodeTone(pcm, granules, gg = 192, tsel = 12)
    assert(frames.forall(_.gr.forall(_.forall(_.is.forall(v => math.abs(v) <= 7)))),
      "tone quantization must fit the trusted tables")
    val bytes = encode(frames)
    val got = Mp3Decoder.decode(bytes).getOrElse(fail("no decode"))
    // compare the steady region against the source, aligned by the
    // filterbank+MDCT chain delay (measured once: the chain is causal
    // within one granule; correlate to find it)
    val steady = got.drop(1200).take(2000)
    var best = (-1.0, 0)
    for (d <- -64 until 1340) {
      val src = pcm.slice(1200 + d, 1200 + d + 2000)
      val c = steady.zip(src).map { case (a, b) => a * b }.sum
      if (c > best._1) best = (c, d)
    }
    val src = pcm.slice(1200 + best._2, 1200 + best._2 + 2000)
    val g = steady.zip(src).map { case (a, b) => a * b }.sum / src.map(v => v * v).sum
    val err = steady.zip(src).map { case (a, b) => a - g * b }
    val snr = 10 * math.log10(steady.map(v => v * v).sum / err.map(v => v * v).sum)
    // |is| <= 7 caps the per-line precision at ~(4/3)(0.5/4) — a coarse
    // quantizer by construction; the pin is "a recognizable tone with
    // unit gain through the PUBLIC decode path", not transparency (the
    // surrogate-table test below carries the high-SNR leg)
    info(f"tone SNR $snr%.1f dB (coarse 3-bit quantizer), delay ${best._2}, gain $g%.3f")
    assert(snr > 10, s"tone SNR $snr dB")
    assert(math.abs(g - 1.0) < 0.2, s"gain $g drifted")
  }

  /** Canonical surrogate 16x16 table (CLEARLY SYNTHETIC — not ISO
    * data): Huffman-built from a smooth frequency model, canonical
    * code assignment. Exercises the escape/linbits engine without
    * fabricating spec tables; production never sees these (decode()
    * carries null in those slots — asserted below).
    */
  private def surrogate16(linbits: Int): HuffTable = {
    // package-merge-free simple Huffman: repeatedly merge two smallest
    case class Node(freq: Double, syms: List[Int])
    var nodes = (for (x <- 0 until 16; y <- 0 until 16)
      yield Node(1.0 / ((x + 2.0) * (y + 2.0)), List(x * 16 + y))).toList
    val depth = new Array[Int](256)
    while (nodes.length > 1) {
      val sorted = nodes.sortBy(_.freq)
      val a = sorted.head; val b = sorted(1)
      (a.syms ++ b.syms).foreach(s => depth(s) += 1)
      nodes = Node(a.freq + b.freq, a.syms ++ b.syms) :: sorted.drop(2)
    }
    // canonical assignment from lengths
    val order = (0 until 256).sortBy(s => (depth(s), s))
    val codes = new Array[Int](256)
    var code = 0; var prevLen = 0
    for (s <- order) {
      code <<= (depth(s) - prevLen); prevLen = depth(s)
      codes(s) = code; code += 1
    }
    new HuffTable(16, depth, codes, linbits)
  }

  test("linbits/escape engine: surrogate tables carry |values| up to 15+2^linbits-1 bit-exactly") {
    val tables = Mp3Tables.BigValue.clone()
    tables(16) = surrogate16(4)
    tables(24) = surrogate16(13)
    val rng = new scala.util.Random(20260822L)
    for (iter <- 1 to 10) {
      val tsel = if (rng.nextBoolean()) 16 else 24
      val lim = 15 + (1 << tables(tsel).linbits) - 1
      val bigValues = 10 + rng.nextInt(30)
      val is = new Array[Int](576)
      for (i <- 0 until bigValues * 2) {
        val m = rng.nextInt(3) match {
          case 0 => rng.nextInt(15)          // below escape
          case 1 => 15                        // exact escape, linbits 0
          case _ => 15 + rng.nextInt(lim - 14) // escape + linbits
        }
        is(i) = if (rng.nextBoolean()) m else -m
      }
      def g() = randomGr(rng, stereoBudget = false, lsf = false)
        .copy(is = is, bigValues = bigValues, count1 = 0, blockType = 0, mixed = false,
          tableSelect = Array(tsel, tsel, tsel), globalGain = 130)
      val frames = Seq(Frame(Array(Array(g()), Array(g()))))
      val bytes = encode(frames, tables = tables)
      val got = Mp3Decoder.decodeWith(tables, bytes).getOrElse(fail(s"iter $iter: no decode"))
      assertClose(got, refDecode(frames), s"iter $iter tsel=$tsel")
    }
  }

  test("end-to-end tone through surrogate linbits tables reaches transparent-ish SNR") {
    val granules = 8
    val n = 512 + 32 * 18 * (granules + 1)
    val pcm = Array.tabulate(n)(i => 0.4 * math.sin(2 * math.Pi * 441.0 / 44100.0 * i))
    val tables = Mp3Tables.BigValue.clone()
    tables(24) = surrogate16(13)
    // gg=160: the quantizer step sits above the analysis stopband
    // leakage (sparse spectrum, part2_3_length fits its 12-bit field)
    // but fine enough for ~50 dB on the tone lines
    val frames = encodeTone(pcm, granules, gg = 160, tsel = 24)
    val bytes = encode(frames, tables = tables)
    val got = Mp3Decoder.decodeWith(tables, bytes).getOrElse(fail("no decode"))
    val steady = got.drop(1200).take(2000)
    var best = (-1.0, 0)
    for (d <- -64 until 1340) {
      val src = pcm.slice(1200 + d, 1200 + d + 2000)
      val c = steady.zip(src).map { case (a, b) => a * b }.sum
      if (c > best._1) best = (c, d)
    }
    val src = pcm.slice(1200 + best._2, 1200 + best._2 + 2000)
    val g = steady.zip(src).map { case (a, b) => a * b }.sum / src.map(v => v * v).sum
    val err = steady.zip(src).map { case (a, b) => a - g * b }
    val snr = 10 * math.log10(steady.map(v => v * v).sum / err.map(v => v * v).sum)
    info(f"tone SNR $snr%.1f dB (13-bit linbits quantizer)")
    assert(snr > 45, s"tone SNR $snr dB")
  }

  // ------------------------------------------------------------------
  // Boundaries, routing, foreign anchor
  // ------------------------------------------------------------------
  test("uncarried table select degrades the payload to None — loud, never wrong") {
    val rng = new scala.util.Random(20260823L)
    val tables = Mp3Tables.BigValue.clone()
    tables(16) = surrogate16(1) // encode WITH the surrogate...
    val g = randomGr(rng, stereoBudget = false, lsf = false)
      .copy(blockType = 0, mixed = false, tableSelect = Array(16, 16, 16),
        is = Array.tabulate(576)(i => if (i < 20) 3 else 0), bigValues = 10, count1 = 0)
    val bytes = encode(Seq(Frame(Array(Array(g), Array(g)))), tables = tables)
    // ...but decode through the PRODUCTION tables: slot 16 is null
    assert(Mp3Decoder.decode(bytes).isEmpty,
      "a frame selecting an uncarried table must not decode")
  }

  test("foreign anchor: the machine's real LAME-encoded MPEG-2 stream (digital silence) decodes exactly") {
    val path = java.nio.file.Paths.get(
      "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3")
    assume(java.nio.file.Files.exists(path), "foreign fixture not present on this machine")
    val bytes = java.nio.file.Files.readAllBytes(path)
    assert(Mp3Decoder.supports(bytes), "foreign stream must route here")
    val got = Mp3Decoder.decode(bytes).getOrElse(fail("foreign stream did not decode"))
    // 45 LSF frames x 576 samples of digital silence: the whole chain
    // (ID3 skip, LSF side info, reservoir fields with mdb saturated at
    // 255, zero spectrum through IMDCT+synthesis) must emit exact zeros
    assert(got.length == 45 * 576, s"expected 25920 samples, got ${got.length}")
    assert(got.forall(_ == 0.0), "silence must decode to exact zeros")
  }

  test("supports: routing is disjoint from the other builtins; MPEG-2.5/free-format rejected") {
    val rng = new scala.util.Random(20260824L)
    val g = randomGr(rng, stereoBudget = false, lsf = false)
    val mp3 = encode(Seq(Frame(Array(Array(g), Array(g)))))
    assert(Mp3Decoder.supports(mp3))
    assert(AudioDecoder.builtins.find(_.supports(mp3)).get eq Mp3Decoder)
    // ID3-prefixed payload routes here too
    val tagged = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 10) ++
      new Array[Byte](10) ++ mp3
    assert(Mp3Decoder.supports(tagged))
    assert(Mp3Decoder.decode(tagged).isDefined)
    // ID3v2.4 footer flag (0x10): 10 extra bytes after the tag body
    val footered = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 10) ++
      new Array[Byte](20) ++ mp3
    assert(Mp3Decoder.supports(footered))
    assert(Mp3Decoder.decode(footered).isDefined)
    // MPEG-2.5 (version bits 00) and free-format (bri 0) rejected
    val v25 = mp3.clone(); v25(1) = 0xE3.toByte
    assert(!Mp3Decoder.supports(v25))
    val free = mp3.clone(); free(2) = (free(2) & 0x0F).toByte
    assert(!Mp3Decoder.supports(free))
    // a WAV/FLAC payload is never claimed
    val pcm = Array.tabulate(512)(i => (math.sin(i / 9.0) * 9000).toInt)
    val (wav, _) = AdpcmTestEncoder.encode(Array(pcm), 8000, 9)
    assert(!Mp3Decoder.supports(wav))
  }

  test("Spark pipeline: an MP3 payload embeds through embedAudio next to its WAV twin") {
    import graft.operators.multimodal.BinaryPipeline
    val spark = TestSpark.spark
    import spark.implicits._
    val granules = 8
    val n = 512 + 32 * 18 * (granules + 1)
    val pcm = Array.tabulate(n)(i => 0.4 * math.sin(2 * math.Pi * 441.0 / 44100.0 * i))
    val mp3 = encode(encodeTone(pcm, granules, gg = 192, tsel = 12))
    // 16-bit WAV twin of the SOURCE pcm
    val wav = {
      val out = new ArrayBuffer[Byte]()
      def w16(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
      def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
      def tg(t: String): Unit = t.foreach(c => out += c.toByte)
      tg("RIFF"); w32(36L + pcm.length * 2); tg("WAVE")
      tg("fmt "); w32(16); w16(1); w16(1); w32(44100); w32(88200); w16(2); w16(16)
      tg("data"); w32(pcm.length.toLong * 2)
      pcm.foreach(v => w16(math.rint(v * 32767).toInt & 0xffff))
      out.toArray
    }
    val media = Seq(
      (0L, "audio", mp3),
      (1L, "audio", wav),
      (2L, "image", mp3) // wrong modality: gated out
    ).toDF("doc_id", "media_type", "data")
    val emb = BinaryPipeline.embedAudio(spark, media)
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(vecs.keySet == Set(0L, 1L), s"got ${vecs.keySet}")
    // lossy twin: the coarse trusted-table quantizer (~12 dB) still
    // leaves the band-energy/ZCR features pointing the same way — the
    // embedding contract the per-band-phase caveat in the decoder
    // scaladoc appeals to
    val (a, b) = (vecs(0L), vecs(1L))
    val cos = a.zip(b).map { case (x, y) => x * y }.sum /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    info(f"mp3-vs-wav embedding cosine $cos%.4f")
    assert(cos > 0.9, s"embedding cosine $cos")
  }

  test("corruption and truncation degrade to None or fewer frames, never throw") {
    val rng = new scala.util.Random(20260825L)
    val g = randomGr(rng, stereoBudget = false, lsf = false)
    val frames = Seq.fill(3)(Frame(Array(Array(g), Array(g))))
    val mp3 = encode(frames)
    for (_ <- 1 to 300) {
      val c = mp3.clone()
      for (_ <- 0 until 1 + rng.nextInt(6))
        c(rng.nextInt(c.length)) = (rng.nextInt(256) - 128).toByte
      Mp3Decoder.decode(c)       // must not throw
      Mp3Decoder.supports(c)     // must not throw
    }
    for (len <- 1 until mp3.length by 17) {
      val t = java.util.Arrays.copyOf(mp3, len)
      Mp3Decoder.decode(t)
      Mp3Decoder.supports(t)
    }
    // truncation mid-stream: decoded prefix is still the reconstruction prefix
    val full = Mp3Decoder.decode(mp3).get
    val cut = Mp3Decoder.decode(java.util.Arrays.copyOf(mp3, mp3.length - 40))
    cut.foreach { partial =>
      assert(partial.length < full.length)
      assertClose(partial, full.take(partial.length), "truncated prefix")
    }
    // mid-stream corruption degrades the WHOLE payload (loud, never a
    // silently shortened clip): kill the second frame's sync byte
    val hdr2 = {
      // frame 1 starts at 0; compute its length from the header fields
      val bri = (mp3(2) & 0xFF) >> 4
      val pad = (mp3(2) >> 1) & 1
      144000 * Seq(0,32,40,48,56,64,80,96,112,128,160,192,224,256,320)(bri) / 44100 + pad
    }
    val midCorrupt = mp3.clone()
    midCorrupt(hdr2) = 0x00
    assert(Mp3Decoder.decode(midCorrupt).isEmpty,
      "a corrupted mid-stream header must degrade the payload to None")
  }
}
