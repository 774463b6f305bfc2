package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.multimodal.{AviFrames, BinaryPipeline, FrameDecoder, H264, H264IntraDecoder}
import H264Fixture._

/** Validation for the pure-JVM H.264 baseline-intra decoder:
  *
  *  1. structural table checks — every CAVLC VLC table must be a
  *     prefix-free, Kraft-complete code and the CBP map a permutation
  *     (a transcription slip in Table 9-5/9-7/9-10 breaks one of these
  *     with high probability);
  *  2. the worked CAVLC example published in the open literature
  *     (Richardson, "H.264 and MPEG-4 Video Compression", §6.4.13:
  *     TotalCoeffs 5, T1s 3, total_zeros 3), pinned bit-for-bit;
  *  3. I_PCM roundtrips — table-free, so they certify the NAL/slice
  *     plumbing unconditionally (including emulation prevention);
  *  4. randomized frames (I_PCM + I_16x16 + I_4x4, every pred mode,
  *     random sparse coefficients, QPs spanning all scaling branches)
  *     encoded by [[H264Fixture]] and decoded by [[H264]], compared
  *     bit-for-bit against [[H264RefRecon]] — an independent
  *     reconstruction sharing no code with the decoder;
  *  5. container integration: H264-fourcc AVI chunks decode through
  *     the [[FrameDecoder]] built-ins into `embedVideoFrames`;
  *  6. corruption fuzz — arbitrary and mutated bytes must degrade to
  *     None, never throw.
  */
class H264Spec extends AnyFunSuite {

  // ---------------- 1. structural table checks ----------------

  /** Prefix-free, and complete up to the spec's reserved-invalid
    * corner: the coeff_token tables leave a small all-zeros-prefix
    * region unassigned (VLC0 reserves the two 16-bit leaves under
    * fifteen zeros; VLC1/VLC2 reserve the single all-zeros leaf);
    * every other table is Kraft-complete. Any transcription slip that
    * changes a code length or drops/duplicates a leaf breaks one of
    * these — uncovered leaves anywhere OUTSIDE the all-zeros corner
    * are rejected.
    */
  private def checkPrefixFreeComplete(name: String, codes: Set[String]): Unit = {
    codes.foreach { c =>
      codes.foreach { d =>
        assert(c == d || !d.startsWith(c), s"$name: '$c' prefixes '$d'")
      }
    }
    val maxLen = codes.map(_.length).max
    // enumerate uncovered maxLen-bit leaves exactly
    val uncovered = (0 until (1 << maxLen)).map { v =>
      (maxLen - 1 to 0 by -1).map(i => ('0' + ((v >> i) & 1)).toChar).mkString
    }.filterNot(leaf => codes.exists(leaf.startsWith))
    assert(uncovered.size <= 2, s"$name: ${uncovered.size} uncovered leaves")
    val corner = "0" * (maxLen - 2)
    uncovered.foreach { leaf =>
      assert(leaf.startsWith(corner),
        s"$name: uncovered leaf $leaf outside the all-zeros corner")
    }
  }

  test("every CAVLC VLC table is prefix-free and Kraft-complete") {
    val tables: Seq[(String, H264.Vlc)] =
      Seq("coeff_token nC<2" -> H264.CoeffTokenNc0,
        "coeff_token nC<4" -> H264.CoeffTokenNc2,
        "coeff_token nC<8" -> H264.CoeffTokenNc4,
        "coeff_token chromaDC" -> H264.CoeffTokenChromaDc) ++
        (1 to 15).map(tc => s"total_zeros tc=$tc" -> H264.TotalZeros4x4(tc)) ++
        (1 to 3).map(tc => s"total_zeros_cdc tc=$tc" -> H264.TotalZerosChromaDc(tc)) ++
        (1 to 7).map(zl => s"run_before zl=$zl" -> H264.RunBefore(zl))
    tables.foreach { case (name, vlc) =>
      checkPrefixFreeComplete(name, vlc.byCode.keySet)
    }
    // each coeff_token table carries exactly the 62 legal (tc, t1) pairs
    val legal = (for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc)) yield H264.ct(tc, t1)).toSet
    Seq(H264.CoeffTokenNc0, H264.CoeffTokenNc2, H264.CoeffTokenNc4).foreach { t =>
      assert(t.byValue.keySet == legal)
    }
    val legalCdc = (for (tc <- 0 to 4; t1 <- 0 to math.min(3, tc)) yield H264.ct(tc, t1)).toSet
    assert(H264.CoeffTokenChromaDc.byValue.keySet == legalCdc)
    // total_zeros table tc covers exactly 0..16-tc (AC tables 0..15-tc
    // are a subset read; the 16-coeff case bounds the range)
    (1 to 15).foreach { tc =>
      assert(H264.TotalZeros4x4(tc).byValue.keySet == (0 to 16 - tc).toSet,
        s"total_zeros tc=$tc value range")
    }
    (1 to 3).foreach { tc =>
      assert(H264.TotalZerosChromaDc(tc).byValue.keySet == (0 to 4 - tc).toSet)
    }
    (1 to 6).foreach { zl =>
      assert(H264.RunBefore(zl).byValue.keySet == (0 to zl).toSet)
    }
    assert(H264.RunBefore(7).byValue.keySet == (0 to 14).toSet)
  }

  test("the intra CBP mapping is a permutation of 0..47, with the published anchors") {
    assert(H264.CbpIntra.sorted.toSeq == (0 to 47))
    // Table 9-4 anchors every transcription reproduces: codeNum 0 -> 47
    // (all blocks coded), 3 -> 0 (nothing coded), 1 -> 31, 2 -> 15
    assert(H264.CbpIntra(0) == 47 && H264.CbpIntra(3) == 0)
    assert(H264.CbpIntra(1) == 31 && H264.CbpIntra(2) == 15)
  }

  test("dequant weights, zigzag and chroma-QP map match the published tables") {
    assert(H264.Zigzag4x4.toSeq ==
      Seq(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15))
    assert(H264.DequantV.map(_.toSeq).toSeq == Seq(
      Seq(10, 16, 13), Seq(11, 18, 14), Seq(13, 20, 16),
      Seq(14, 23, 18), Seq(16, 25, 20), Seq(18, 29, 23)))
    assert(H264.ChromaQpMap(29) == 29 && H264.ChromaQpMap(30) == 29 &&
      H264.ChromaQpMap(39) == 35 && H264.ChromaQpMap(51) == 39)
  }

  // ---------------- 2. the published worked example ----------------

  test("worked CAVLC example (Richardson §6.4.13) encodes bit-for-bit") {
    // 4x4 block { 0, 3, -1, 0 / 0, -1, 1, 0 / 1, 0, 0, 0 / 0 ... }:
    // zigzag readout 0,3,0,1,-1,-1,0,1,0..., TotalCoeffs 5, T1s 3,
    // total_zeros 3 — published bitstream 000010001110010111101101
    val zz = Array(0, 3, 0, 1, -1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0)
    val w = new BitWriter
    val tc = writeResidual(w, zz, nC = 0, maxNumCoeff = 16)
    w.byteAlignZeros()
    assert(tc == 5)
    val got = w.toRbsp.flatMap(b =>
      (7 to 0 by -1).map(i => ('0' + ((b >> i) & 1)).toChar)).mkString
    assert(got.startsWith("000010001110010111101101"),
      s"got ${got.take(24)}... want 000010001110010111101101")
  }

  // ---------------- 3. I_PCM roundtrips ----------------

  private def randPlanes(rng: scala.util.Random): (Array[Int], Array[Int], Array[Int]) =
    (Array.fill(256)(rng.nextInt(256)), Array.fill(64)(rng.nextInt(256)),
      Array.fill(64)(rng.nextInt(256)))

  test("I_PCM frames roundtrip bit-exactly (tables never consulted)") {
    val rng = new scala.util.Random(41L)
    for (_ <- 1 to 20) {
      val mbW = 1 + rng.nextInt(3)
      val mbH = 1 + rng.nextInt(3)
      val mbs = Seq.fill(mbW * mbH) {
        val (py, pcb, pcr) = randPlanes(rng)
        Pcm(py, pcb, pcr)
      }
      val stream = encodeFrame(mbW, mbH, mbs, qp = 26)
      val f = H264.decodeFrame(stream, 0, stream.length)
        .getOrElse(fail("PCM frame did not decode"))
      val (ry, rcb, rcr) = H264RefRecon.recon(mbW, mbH, mbs, 26)
      assert(f.y.toSeq == ry.toSeq, "luma plane")
      assert(f.cb.toSeq == rcb.toSeq, "cb plane")
      assert(f.cr.toSeq == rcr.toSeq, "cr plane")
    }
  }

  test("emulation prevention: all-zero PCM payloads survive the escape path") {
    val mbs = Seq(Pcm(Array.fill(256)(0), Array.fill(64)(0), Array.fill(64)(0)))
    val stream = encodeFrame(1, 1, mbs, qp = 26)
    // the stream MUST carry 00 00 03 escapes for the zero runs
    assert(stream.sliding(3).exists(w => w(0) == 0 && w(1) == 0 && w(2) == 3))
    val f = H264.decodeFrame(stream, 0, stream.length).getOrElse(fail("no decode"))
    assert(f.y.forall(_ == 0) && f.cb.forall(_ == 0) && f.cr.forall(_ == 0))
  }

  test("frame cropping trims the raster to the SPS-declared size") {
    val rng = new scala.util.Random(43L)
    val (py, pcb, pcr) = randPlanes(rng)
    val mbs = Seq(Pcm(py, pcb, pcr))
    // crop 2 luma right / 4 luma bottom (units of 2 for 4:2:0)
    val stream = encodeFrame(1, 1, mbs, qp = 26, cropR = 1, cropB = 2)
    val f = H264.decodeFrame(stream, 0, stream.length).getOrElse(fail("no decode"))
    val img = H264.toImage(f)
    assert(img.getWidth == 14 && img.getHeight == 12)
    // pixel (x, y) must be the BT.601 conversion of the source planes
    for (x <- 0 until 14; y <- 0 until 12) {
      val want = H264.yuvToRgb(py(y * 16 + x), pcb((y / 2) * 8 + x / 2),
        pcr((y / 2) * 8 + x / 2))
      assert((img.getRGB(x, y) & 0xffffff) == want, s"pixel ($x,$y)")
    }
  }

  // ---------------- 4. randomized coded frames vs the reference ----------------

  /** Sparse random zigzag coefficients. */
  private def sparseZz(rng: scala.util.Random, n: Int, maxCoeffs: Int): Array[Int] = {
    val zz = new Array[Int](n)
    val count = rng.nextInt(maxCoeffs + 1)
    for (_ <- 0 until count) {
      val pos = rng.nextInt(n)
      zz(pos) = (rng.nextInt(8) + 1) * (if (rng.nextBoolean()) 1 else -1)
    }
    zz
  }

  /** A random legal MB for position (mbX, mbY). Pred modes are drawn
    * from the set legal under neighbor availability; coefficients tied
    * to the drawn CBP.
    */
  private def randMb(rng: scala.util.Random, mbX: Int, mbY: Int): Mb = {
    val left = mbX > 0
    val top = mbY > 0
    val cbpChroma = rng.nextInt(3)
    def chromaMode = {
      val legal = Seq(0) ++ (if (left) Seq(1) else Nil) ++
        (if (top) Seq(2) else Nil) ++ (if (left && top) Seq(3) else Nil)
      legal(rng.nextInt(legal.size))
    }
    def chromaData(): (Array[Int], Array[Int], Array[Array[Int]], Array[Array[Int]]) = {
      if (cbpChroma == 0)
        (new Array[Int](4), new Array[Int](4), null, null)
      else if (cbpChroma == 1)
        (sparseZz(rng, 4, 3), sparseZz(rng, 4, 3), null, null)
      else
        (sparseZz(rng, 4, 3), sparseZz(rng, 4, 3),
          Array.fill(4)(sparseZz(rng, 15, 4)), Array.fill(4)(sparseZz(rng, 15, 4)))
    }
    rng.nextInt(3) match {
      case 0 =>
        val (py, pcb, pcr) = randPlanes(rng)
        Pcm(py, pcb, pcr)
      case 1 =>
        val legal16 = Seq(2) ++ (if (top) Seq(0) else Nil) ++
          (if (left) Seq(1) else Nil) ++ (if (left && top) Seq(3) else Nil)
        val acAll = rng.nextBoolean()
        val (cbDc, crDc, cbAc, crAc) = chromaData()
        I16(legal16(rng.nextInt(legal16.size)),
          dc = sparseZz(rng, 16, 6),
          ac = if (acAll) Array.fill(16)(sparseZz(rng, 15, 4)) else null,
          cbpChroma, cbDc, crDc, cbAc, crAc, chromaMode)
      case _ =>
        // per-block legal mode sets under the global availability rule
        val modes = (0 until 16).map { b =>
          val (px, py) = H264.Luma4x4Pos(b)
          // availability mirrors the decode-order predicate: the block
          // row above is decoded unless at the frame top; left column
          // unless at the frame left edge
          val aT = top || py > 0
          val aL = left || px > 0
          val legal = Seq(2) ++ (if (aT) Seq(0, 3, 7) else Nil) ++
            (if (aL) Seq(1, 8) else Nil) ++
            (if (aT && aL) Seq(4, 5, 6) else Nil)
          legal(rng.nextInt(legal.size))
        }.toArray
        val cbpLuma = rng.nextInt(16)
        val blocks = (0 until 16).map { b =>
          if (((cbpLuma >> (b / 4)) & 1) == 1) sparseZz(rng, 16, 5)
          else new Array[Int](16)
        }.toArray
        val (cbDc, crDc, cbAc, crAc) = chromaData()
        I4(modes, chromaMode, cbpLuma, cbpChroma, blocks,
          cbDc, crDc, cbAc, crAc)
    }
  }

  test("fuzz: random coded frames decode bit-identically to the independent reference") {
    val rng = new scala.util.Random(20260815L)
    // QPs spanning every scaling branch: qp < 12 (luma-DC rounding
    // path), qp in the chroma-map knee, and the common range
    val qps = Array(8, 10, 16, 22, 26, 30, 35, 40)
    for (iter <- 1 to 250) {
      val mbW = 1 + rng.nextInt(3)
      val mbH = 1 + rng.nextInt(2)
      val qp = qps(rng.nextInt(qps.length))
      val mbs = (0 until mbW * mbH).map(a => randMb(rng, a % mbW, a / mbW))
      val stream = encodeFrame(mbW, mbH, mbs, qp)
      val f = H264.decodeFrame(stream, 0, stream.length)
        .getOrElse(fail(s"iter $iter (${mbW}x$mbH qp=$qp): no decode"))
      val (ry, rcb, rcr) = H264RefRecon.recon(mbW, mbH, mbs, qp)
      assert(f.y.toSeq == ry.toSeq, s"iter $iter luma (${mbW}x$mbH qp=$qp)")
      assert(f.cb.toSeq == rcb.toSeq, s"iter $iter cb")
      assert(f.cr.toSeq == rcr.toSeq, s"iter $iter cr")
    }
  }

  // ---------------- 5. container integration ----------------

  test("H264-fourcc AVI decodes through the built-ins into embedVideoFrames") {
    val rng = new scala.util.Random(7L)
    // three one-MB keyframe chunks, each a self-contained access unit
    val frames = (0 until 3).map { _ =>
      val (py, pcb, pcr) = randPlanes(rng)
      encodeFrame(1, 1, Seq(Pcm(py, pcb, pcr)), qp = 26)
    }
    val avi = AviFixture.build("H264", 16, 16, 24, frames)
    val got = AviFrames.videoFrames(avi)
    assert(got.map(_._1) == Seq(0, 1, 2))
    assert(got.forall { case (_, img) => img.getWidth == 16 && img.getHeight == 16 })
    // decoder identity: same raster as decoding the chunk directly
    val direct = H264.decodeFrame(frames(0), 0, frames(0).length).get
    val expect = H264.toImage(direct)
    for (x <- 0 until 16; y <- 0 until 16)
      assert((got.head._2.getRGB(x, y) & 0xffffff) == (expect.getRGB(x, y) & 0xffffff))

    // end-to-end: frame embeddings flow from real compressed video
    val spark = TestSpark.spark
    import spark.implicits._
    val media = Seq((1L, "video", avi)).toDF("doc_id", "media_type", "data")
    val rows = BinaryPipeline.embedVideoFrames(spark, media)
      .orderBy("frame_idx").collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(rows.forall(_.getSeq[Float](2).nonEmpty))
  }

  test("inter-coded (non-IDR) chunks are skipped, not fabricated") {
    val rng = new scala.util.Random(9L)
    val (py, pcb, pcr) = randPlanes(rng)
    val idr = encodeFrame(1, 1, Seq(Pcm(py, pcb, pcr)), qp = 26)
    // forge a "P-slice" NAL (type 1) — the decoder must skip it
    val pSlice = nal(1, 2, Array[Byte](0x12, 0x34, 0x56))
    val avi = AviFixture.build("H264", 16, 16, 24, Seq(idr, pSlice, idr))
    val got = AviFrames.videoFrames(avi)
    assert(got.map(_._1) == Seq(0, 2), "only the keyframes decode")
  }

  // ---------------- 6. corruption fuzz ----------------

  test("corrupt and truncated streams degrade to None, never throw") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rng = new scala.util.Random(13L)
    val mbs = (0 until 4).map(a => randMb(rng, a % 2, a / 2))
    val good = encodeFrame(2, 2, mbs, 26)
    assert(H264.decodeFrame(good, 0, good.length).isDefined)
    val arbitrary = Prop.forAll(Gen.containerOf[Array, Byte](
      Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      H264.decodeFrame(bytes, 0, bytes.length)
      true // no throw
    }
    val mutated = Prop.forAll(Gen.choose(0, good.length - 1), Gen.choose(0, 255)) {
      (pos, b) =>
        H264.decodeFrame(good.take(pos), 0, pos)
        val flipped = good.clone(); flipped(pos) = b.toByte
        H264.decodeFrame(flipped, 0, flipped.length)
        true
    }
    val params = SCTest.Parameters.default.withMinSuccessfulTests(400)
    assert(SCTest.check(params, arbitrary).passed, "arbitrary-bytes fuzz")
    assert(SCTest.check(params, mutated).passed, "mutated-stream fuzz")
  }
}
