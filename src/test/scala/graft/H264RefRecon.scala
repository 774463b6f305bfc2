package graft

import H264Fixture.{I16, I4, Mb, Pcm}

/** Independent reference reconstruction for [[H264Fixture]] MB
  * descriptions — written fresh from the spec clauses (8.3 intra
  * prediction, 8.5 transforms) with its OWN copies of every constant
  * (scan order, dequant weights, chroma-QP map), sharing no code with
  * the production decoder. H264Spec asserts the production decoder's
  * planes equal this reconstruction bit-for-bit on randomized frames:
  * two implementations of the same published arithmetic must agree.
  */
object H264RefRecon {

  // own copies of the spec constants (Table 8-13, 8-14, 8-15, 6.4.3)
  private val zig = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val vTab = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
  private def vFor(pos: Int): Int = {
    val r = pos / 4; val c = pos % 4
    if (r % 2 == 0 && c % 2 == 0) 0 else if (r % 2 == 1 && c % 2 == 1) 1 else 2
  }
  private val blkPos = Array(
    (0, 0), (4, 0), (0, 4), (4, 4), (8, 0), (12, 0), (8, 4), (12, 4),
    (0, 8), (4, 8), (0, 12), (4, 12), (8, 8), (12, 8), (8, 12), (12, 12))
  private val qpcTab: Array[Int] = {
    val m = (0 until 30).toArray ++ Array(29, 30, 31, 32, 32, 33, 34, 34,
      35, 35, 36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39)
    m
  }
  private def clip(v: Int): Int = math.max(0, math.min(255, v))

  /** zigzag(16) -> raster 4x4. */
  private def unzig(zz: Array[Int]): Array[Int] = {
    val d = new Array[Int](16)
    for (i <- 0 until 16) d(zig(i)) = zz(i)
    d
  }
  /** AC-only zigzag(15) -> raster with DC slot 0 empty. */
  private def unzigAc(zz: Array[Int]): Array[Int] = {
    val d = new Array[Int](16)
    for (i <- 0 until 15) d(zig(i + 1)) = zz(i)
    d
  }

  private def dequant(d: Array[Int], qp: Int, skipDc: Boolean): Array[Int] =
    d.zipWithIndex.map { case (c, i) =>
      if (skipDc && i == 0) c
      else (c * vTab(qp % 6)(vFor(i))) << (qp / 6)
    }

  private def idct(in: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    for (r <- 0 until 4) {
      val o = r * 4
      val e0 = in(o) + in(o + 2); val e1 = in(o) - in(o + 2)
      val e2 = (in(o + 1) >> 1) - in(o + 3); val e3 = in(o + 1) + (in(o + 3) >> 1)
      t(o) = e0 + e3; t(o + 1) = e1 + e2; t(o + 2) = e1 - e2; t(o + 3) = e0 - e3
    }
    val out = new Array[Int](16)
    for (c <- 0 until 4) {
      val e0 = t(c) + t(c + 8); val e1 = t(c) - t(c + 8)
      val e2 = (t(c + 4) >> 1) - t(c + 12); val e3 = t(c + 4) + (t(c + 12) >> 1)
      out(c) = (e0 + e3 + 32) >> 6; out(c + 4) = (e1 + e2 + 32) >> 6
      out(c + 8) = (e1 - e2 + 32) >> 6; out(c + 12) = (e0 - e3 + 32) >> 6
    }
    out
  }

  private def hadamard4(in: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    for (r <- 0 until 4) {
      val o = r * 4
      val e0 = in(o) + in(o + 2); val e1 = in(o) - in(o + 2)
      val e2 = in(o + 1) - in(o + 3); val e3 = in(o + 1) + in(o + 3)
      t(o) = e0 + e3; t(o + 1) = e1 + e2; t(o + 2) = e1 - e2; t(o + 3) = e0 - e3
    }
    val out = new Array[Int](16)
    for (c <- 0 until 4) {
      val e0 = t(c) + t(c + 8); val e1 = t(c) - t(c + 8)
      val e2 = t(c + 4) - t(c + 12); val e3 = t(c + 4) + t(c + 12)
      out(c) = e0 + e3; out(c + 4) = e1 + e2; out(c + 8) = e1 - e2
      out(c + 12) = e0 - e3
    }
    out
  }

  private def scaleLumaDc(f: Int, qp: Int): Int = {
    val v0 = vTab(qp % 6)(0)
    if (qp >= 12) (f * v0) << (qp / 6 - 2)
    else (f * v0 + (1 << (1 - qp / 6))) >> (2 - qp / 6)
  }
  private def scaleChromaDc(f: Int, qp: Int): Int =
    ((f * vTab(qp % 6)(0) * 16) << (qp / 6)) >> 5

  /** Reconstruct; returns (y, cb, cr) planes, strides mbW*16 / mbW*8. */
  def recon(mbW: Int, mbH: Int, mbs: Seq[Mb], qp: Int)
      : (Array[Int], Array[Int], Array[Int]) = {
    val lw = mbW * 16; val cw = mbW * 8
    val y = new Array[Int](lw * mbH * 16)
    val cb = new Array[Int](cw * mbH * 8)
    val cr = new Array[Int](cw * mbH * 8)
    val qpc = qpcTab(math.max(0, math.min(51, qp))) // chroma_qp_offset = 0

    // global "already reconstructed" predicate for luma 4x4 pred:
    // (mbAddr, blkIdx) strictly earlier in decode order
    def lumaAvail(gx: Int, gy: Int, curAddr: Int, curBlk: Int): Boolean = {
      if (gx < 0 || gy < 0 || gx >= lw || gy >= mbH * 16) return false
      val a = (gy / 16) * mbW + gx / 16
      if (a != curAddr) a < curAddr
      else {
        val lx = gx % 16; val ly = gy % 16
        val b = blkPos.indexWhere { case (px, py) =>
          lx >= px && lx < px + 4 && ly >= py && ly < py + 4 }
        b < curBlk
      }
    }

    mbs.zipWithIndex.foreach { case (mb, addr) =>
      val mbX = addr % mbW; val mbY = addr / mbW
      val gx0 = mbX * 16; val gy0 = mbY * 16
      val left = mbX > 0; val top = mbY > 0

      def reconChromaMb(plane: Array[Int], dcZz: Array[Int],
                        ac: Array[Array[Int]], mode: Int): Unit = {
        val cx0 = mbX * 8; val cy0 = mbY * 8
        val pred = new Array[Int](64)
        mode match {
          case 0 =>
            for (sb <- 0 until 4) {
              val sx = (sb % 2) * 4; val sy = (sb / 2) * 4
              def tS = (0 until 4).map(i => plane((cy0 - 1) * cw + cx0 + sx + i)).sum
              def lS = (0 until 4).map(i => plane((cy0 + sy + i) * cw + cx0 - 1)).sum
              val v = sb match {
                case 0 | 3 =>
                  if (top && left) (tS + lS + 4) >> 3
                  else if (top) (tS + 2) >> 2
                  else if (left) (lS + 2) >> 2
                  else 128
                case 1 =>
                  if (top) (tS + 2) >> 2 else if (left) (lS + 2) >> 2 else 128
                case _ =>
                  if (left) (lS + 2) >> 2 else if (top) (tS + 2) >> 2 else 128
              }
              for (i <- 0 until 16) pred((sy + i / 4) * 8 + sx + i % 4) = v
            }
          case 1 =>
            for (i <- 0 until 64) pred(i) = plane((cy0 + i / 8) * cw + cx0 - 1)
          case 2 =>
            for (i <- 0 until 64) pred(i) = plane((cy0 - 1) * cw + cx0 + i % 8)
          case 3 =>
            var hS = 0; var vS = 0
            for (i <- 0 until 4) {
              val tp = plane((cy0 - 1) * cw + cx0 + 4 + i)
              val tm = plane((cy0 - 1) * cw + cx0 + (2 - i))
              hS += (i + 1) * (tp - tm)
              val lp = plane((cy0 + 4 + i) * cw + cx0 - 1)
              val lm = plane((cy0 + math.max(-1, 2 - i)) * cw + cx0 - 1)
              vS += (i + 1) * (lp - lm)
            }
            val a = 16 * (plane((cy0 + 7) * cw + cx0 - 1) +
              plane((cy0 - 1) * cw + cx0 + 7))
            val b = (34 * hS + 32) >> 6
            val c = (34 * vS + 32) >> 6
            for (yy <- 0 until 8; xx <- 0 until 8)
              pred(yy * 8 + xx) = clip((a + b * (xx - 3) + c * (yy - 3) + 16) >> 5)
        }
        // chroma residual
        val d = dcZz
        val f = Array(d(0) + d(1) + d(2) + d(3), d(0) - d(1) + d(2) - d(3),
          d(0) + d(1) - d(2) - d(3), d(0) - d(1) - d(2) + d(3))
          .map(scaleChromaDc(_, qpc))
        for (sb <- 0 until 4) {
          val sx = (sb % 2) * 4; val sy = (sb / 2) * 4
          val blk = dequant(
            if (ac != null) unzigAc(ac(sb)) else new Array[Int](16),
            qpc, skipDc = true)
          blk(0) = f(sb)
          val res = idct(blk)
          for (i <- 0 until 16) {
            val ox = sx + i % 4; val oy = sy + i / 4
            plane((cy0 + oy) * cw + cx0 + ox) = clip(pred(oy * 8 + ox) + res(i))
          }
        }
      }

      mb match {
        case Pcm(py, pcb, pcr) =>
          for (i <- 0 until 256) y((gy0 + i / 16) * lw + gx0 + i % 16) = py(i)
          for (i <- 0 until 64) {
            cb((mbY * 8 + i / 8) * cw + mbX * 8 + i % 8) = pcb(i)
            cr((mbY * 8 + i / 8) * cw + mbX * 8 + i % 8) = pcr(i)
          }

        case m: I16 =>
          // prediction
          val pred = new Array[Int](256)
          m.predMode match {
            case 0 =>
              for (i <- 0 until 256) pred(i) = y((gy0 - 1) * lw + gx0 + i % 16)
            case 1 =>
              for (i <- 0 until 256) pred(i) = y((gy0 + i / 16) * lw + gx0 - 1)
            case 2 =>
              var s = 0
              if (top && left) {
                for (i <- 0 until 16)
                  s += y((gy0 - 1) * lw + gx0 + i) + y((gy0 + i) * lw + gx0 - 1)
                s = (s + 16) >> 5
              } else if (top) {
                for (i <- 0 until 16) s += y((gy0 - 1) * lw + gx0 + i)
                s = (s + 8) >> 4
              } else if (left) {
                for (i <- 0 until 16) s += y((gy0 + i) * lw + gx0 - 1)
                s = (s + 8) >> 4
              } else s = 128
              java.util.Arrays.fill(pred, s)
            case 3 =>
              var hS = 0; var vS = 0
              for (i <- 0 until 8) {
                hS += (i + 1) * (y((gy0 - 1) * lw + gx0 + 8 + i) -
                  y((gy0 - 1) * lw + gx0 + 6 - i))
                vS += (i + 1) * (y((gy0 + 8 + i) * lw + gx0 - 1) -
                  y((gy0 + 6 - i) * lw + gx0 - 1))
              }
              val a = 16 * (y((gy0 + 15) * lw + gx0 - 1) +
                y((gy0 - 1) * lw + gx0 + 15))
              val b = (5 * hS + 32) >> 6
              val c = (5 * vS + 32) >> 6
              for (yy <- 0 until 16; xx <- 0 until 16)
                pred(yy * 16 + xx) = clip((a + b * (xx - 7) + c * (yy - 7) + 16) >> 5)
          }
          // residual
          val dcR = hadamard4(unzig(m.dc)).map(scaleLumaDc(_, qp))
          for (b <- 0 until 16) {
            val (px, pyo) = blkPos(b)
            val blk = dequant(
              if (m.ac != null) unzigAc(m.ac(b)) else new Array[Int](16),
              qp, skipDc = true)
            blk(0) = dcR((pyo / 4) * 4 + px / 4)
            val res = idct(blk)
            for (i <- 0 until 16) {
              val ox = px + i % 4; val oy = pyo + i / 4
              y((gy0 + oy) * lw + gx0 + ox) =
                clip(pred(oy * 16 + ox) + res(i))
            }
          }
          reconChromaMb(cb, m.cbDc, m.cbAc, m.chromaMode)
          reconChromaMb(cr, m.crDc, m.crAc, m.chromaMode)

        case m: I4 =>
          for (b <- 0 until 16) {
            val (px, pyo) = blkPos(b)
            val gx = gx0 + px; val gy = gy0 + pyo
            val aL = lumaAvail(gx - 1, gy, addr, b)
            val aT = lumaAvail(gx, gy - 1, addr, b)
            val aTL = lumaAvail(gx - 1, gy - 1, addr, b)
            val aTR = lumaAvail(gx + 4, gy - 1, addr, b)
            // p[-1..7, -1] and p[-1, 0..3]
            val t8 = new Array[Int](8)
            val l4 = new Array[Int](4)
            var tl = 0
            if (aT) {
              for (i <- 0 until 4) t8(i) = y((gy - 1) * lw + gx + i)
              for (i <- 4 until 8)
                t8(i) = if (aTR) y((gy - 1) * lw + gx + i) else t8(3)
            }
            if (aL) for (i <- 0 until 4) l4(i) = y((gy + i) * lw + gx - 1)
            if (aTL) tl = y((gy - 1) * lw + gx - 1)
            def p(x: Int, yv: Int): Int =
              if (x == -1 && yv == -1) tl else if (yv == -1) t8(x) else l4(yv)
            val pr = new Array[Int](16)
            m.modes(b) match {
              case 0 => for (i <- 0 until 16) pr(i) = t8(i % 4)
              case 1 => for (i <- 0 until 16) pr(i) = l4(i / 4)
              case 2 =>
                val v =
                  if (aL && aT) (t8.take(4).sum + l4.sum + 4) >> 3
                  else if (aL) (l4.sum + 2) >> 2
                  else if (aT) (t8.take(4).sum + 2) >> 2
                  else 128
                java.util.Arrays.fill(pr, v)
              case 3 =>
                for (yy <- 0 until 4; xx <- 0 until 4)
                  pr(yy * 4 + xx) =
                    if (xx == 3 && yy == 3) (t8(6) + 3 * t8(7) + 2) >> 2
                    else (t8(xx + yy) + 2 * t8(xx + yy + 1) + t8(xx + yy + 2) + 2) >> 2
              case 4 =>
                for (yy <- 0 until 4; xx <- 0 until 4)
                  pr(yy * 4 + xx) =
                    if (xx > yy)
                      (p(xx - yy - 2, -1) + 2 * p(xx - yy - 1, -1) + p(xx - yy, -1) + 2) >> 2
                    else if (xx < yy)
                      (p(-1, yy - xx - 2) + 2 * p(-1, yy - xx - 1) + p(-1, yy - xx) + 2) >> 2
                    else (t8(0) + 2 * tl + l4(0) + 2) >> 2
              case 5 =>
                for (yy <- 0 until 4; xx <- 0 until 4) {
                  val z = 2 * xx - yy
                  pr(yy * 4 + xx) =
                    if (z >= 0 && z % 2 == 0)
                      (p(xx - (yy >> 1) - 1, -1) + p(xx - (yy >> 1), -1) + 1) >> 1
                    else if (z >= 0)
                      (p(xx - (yy >> 1) - 2, -1) + 2 * p(xx - (yy >> 1) - 1, -1) +
                        p(xx - (yy >> 1), -1) + 2) >> 2
                    else if (z == -1) (l4(0) + 2 * tl + t8(0) + 2) >> 2
                    else (p(-1, yy - 1) + 2 * p(-1, yy - 2) + p(-1, yy - 3) + 2) >> 2
                }
              case 6 =>
                for (yy <- 0 until 4; xx <- 0 until 4) {
                  val z = 2 * yy - xx
                  pr(yy * 4 + xx) =
                    if (z >= 0 && z % 2 == 0)
                      (p(-1, yy - (xx >> 1) - 1) + p(-1, yy - (xx >> 1)) + 1) >> 1
                    else if (z >= 0)
                      (p(-1, yy - (xx >> 1) - 2) + 2 * p(-1, yy - (xx >> 1) - 1) +
                        p(-1, yy - (xx >> 1)) + 2) >> 2
                    else if (z == -1) (t8(0) + 2 * tl + l4(0) + 2) >> 2
                    else (p(xx - 1, -1) + 2 * p(xx - 2, -1) + p(xx - 3, -1) + 2) >> 2
                }
              case 7 =>
                for (yy <- 0 until 4; xx <- 0 until 4)
                  pr(yy * 4 + xx) =
                    if (yy % 2 == 0)
                      (t8(xx + (yy >> 1)) + t8(xx + (yy >> 1) + 1) + 1) >> 1
                    else
                      (t8(xx + (yy >> 1)) + 2 * t8(xx + (yy >> 1) + 1) +
                        t8(xx + (yy >> 1) + 2) + 2) >> 2
              case 8 =>
                for (yy <- 0 until 4; xx <- 0 until 4) {
                  val z = xx + 2 * yy
                  pr(yy * 4 + xx) =
                    if (z < 5 && z % 2 == 0)
                      (l4(yy + (xx >> 1)) + l4(yy + (xx >> 1) + 1) + 1) >> 1
                    else if (z < 5)
                      (l4(yy + (xx >> 1)) + 2 * l4(yy + (xx >> 1) + 1) +
                        l4(yy + (xx >> 1) + 2) + 2) >> 2
                    else if (z == 5) (l4(2) + 3 * l4(3) + 2) >> 2
                    else l4(3)
                }
            }
            val res = idct(dequant(unzig(m.blocks(b)), qp, skipDc = false))
            for (i <- 0 until 16)
              y((gy + i / 4) * lw + gx + i % 4) = clip(pr(i) + res(i))
          }
          reconChromaMb(cb, m.cbDc, m.cbAc, m.chromaMode)
          reconChromaMb(cr, m.crDc, m.crAc, m.chromaMode)
      }

    }
    (y, cb, cr)
  }
}
