package graft

import graft.operators.multimodal.{AdpcmDecoder, AudioDecoder, MsAdpcmDecoder}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

/** Test-side IMA ADPCM WAV encoder. The step/index TABLES are shared
  * with the decoder (they define the bitstream); the quantize-and-
  * reconstruct arithmetic is written out independently here — an IMA
  * encoder must track the decoder's reconstruction, so the returned
  * trace pins [[AdpcmDecoder]] BIT-EXACT despite the codec being lossy,
  * and a typo in either side's update breaks the fuzz instead of
  * cancelling (the FlacTestEncoder discipline).
  */
object AdpcmTestEncoder {

  /** Encode per-channel 16-bit PCM into an IMA ADPCM WAV; returns the
    * container bytes and the encoder's own reconstruction trace.
    * `samplesPerBlock - 1` must be a multiple of 8 (canonical layout).
    */
  def encode(channels: Array[Array[Int]], sampleRate: Int,
             samplesPerBlock: Int): (Array[Byte], Array[Array[Int]]) = {
    val ch = channels.length
    require(ch >= 1 && channels.forall(_.length == channels(0).length))
    require((samplesPerBlock - 1) % 8 == 0, "spb-1 must be a multiple of 8")
    val total = channels(0).length
    val nBlocks = (total + samplesPerBlock - 1) / samplesPerBlock
    val blockAlign = 4 * ch + (samplesPerBlock - 1) / 2 * ch
    val recon = Array.fill(ch)(new Array[Int](nBlocks * samplesPerBlock))

    // padded input: repeat the last sample so partial tails fill a block
    def sampleAt(c: Int, i: Int): Int =
      if (i < total) channels(c)(i)
      else if (total == 0) 0
      else channels(c)(total - 1)

    val index = new Array[Int](ch) // carried across blocks
    val data = new ArrayBuffer[Byte]()
    var blk = 0
    while (blk < nBlocks) {
      val s0 = blk * samplesPerBlock
      val pred = new Array[Int](ch)
      // per-channel 4-byte header: predictor = the block's first sample
      for (c <- 0 until ch) {
        pred(c) = math.max(-32768, math.min(32767, sampleAt(c, s0)))
        recon(c)(s0) = pred(c)
        data += (pred(c) & 0xff).toByte
        data += ((pred(c) >> 8) & 0xff).toByte
        data += index(c).toByte
        data += 0
      }
      // nibbles, channels interleaved in 4-byte groups, low nibble first
      val groups = (samplesPerBlock - 1) / 8
      for (g <- 0 until groups; c <- 0 until ch; b <- 0 until 4) {
        var byte = 0
        for (n <- 0 until 2) {
          val si = s0 + 1 + g * 8 + b * 2 + n
          val target = sampleAt(c, si)
          // quantize: sign + 3 magnitude bits against the current step
          val st = AdpcmDecoder.StepTable(index(c))
          var delta = target - pred(c)
          var nib = 0
          if (delta < 0) { nib = 8; delta = -delta }
          if (delta >= st) { nib |= 4; delta -= st }
          if (delta >= (st >> 1)) { nib |= 2; delta -= st >> 1 }
          if (delta >= (st >> 2)) nib |= 1
          // reconstruct EXACTLY as a decoder would (independent copy
          // of the update arithmetic — do not call AdpcmDecoder.step)
          var d2 = st >> 3
          if ((nib & 1) != 0) d2 += st >> 2
          if ((nib & 2) != 0) d2 += st >> 1
          if ((nib & 4) != 0) d2 += st
          pred(c) = if ((nib & 8) != 0) pred(c) - d2 else pred(c) + d2
          if (pred(c) > 32767) pred(c) = 32767
          if (pred(c) < -32768) pred(c) = -32768
          index(c) += Seq(-1, -1, -1, -1, 2, 4, 6, 8)(nib & 7)
          if (index(c) < 0) index(c) = 0
          if (index(c) > 88) index(c) = 88
          recon(c)(si) = pred(c)
          byte |= (nib & 0xf) << (4 * n)
        }
        data += byte.toByte
      }
      blk += 1
    }

    // RIFF/WAVE container: fmt (tag 0x11, cbSize 2, samplesPerBlock) + data
    val out = new ArrayBuffer[Byte]()
    def w16(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    def tag(t: String): Unit = t.foreach(c => out += c.toByte)
    tag("RIFF"); w32(4 + 8 + 20 + 8 + data.length); tag("WAVE")
    tag("fmt "); w32(20)
    w16(0x0011) // wFormatTag: IMA ADPCM
    w16(ch)
    w32(sampleRate)
    w32(sampleRate.toLong * blockAlign / samplesPerBlock) // avg bytes/sec
    w16(blockAlign)
    w16(4) // wBitsPerSample
    w16(2) // cbSize
    w16(samplesPerBlock)
    tag("data"); w32(data.length)
    out ++= data
    (out.toArray, recon)
  }
}

/** IMA ADPCM decode (SURVEY §2 #36d, round 15). */
class AdpcmSpec extends AnyFunSuite {

  test("step table follows the geometric ~1.1008x law: endpoints, monotone, 10% band") {
    val t = AdpcmDecoder.StepTable
    assert(t.length == 89)
    assert(t.head == 7 && t.last == 32767)
    for (i <- 0 until 88) assert(t(i) < t(i + 1), s"not increasing at $i")
    val r = math.pow(32767.0 / 7.0, 1.0 / 88)
    for (i <- 0 until 89) {
      val model = 7.0 * math.pow(r, i)
      assert(math.abs(t(i) - model) <= 0.10 * model,
        s"entry $i: ${t(i)} vs model $model")
    }
    assert(AdpcmDecoder.IndexTable.toSeq == Seq(-1, -1, -1, -1, 2, 4, 6, 8))
  }

  private def signal(n: Int, seed: Long, amp: Double = 9000): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n) { i =>
      (math.sin(i / 9.0) * amp + math.sin(i / 2.3) * amp / 4 +
        rnd.nextInt(401) - 200).toInt.max(-32768).min(32767)
    }
  }

  test("fuzz: decode is bit-exact against the encoder's reconstruction trace") {
    val rng = new scala.util.Random(20260816L)
    for (iter <- 1 to 60) {
      val ch = 1 + rng.nextInt(2)
      val spb = Seq(9, 17, 33, 505)(rng.nextInt(4))
      val n = spb * (1 + rng.nextInt(4)) // whole blocks
      val pcm = Array.fill(ch)(signal(n, rng.nextLong()))
      val (wav, recon) = AdpcmTestEncoder.encode(pcm, 8000, spb)
      val got = AdpcmDecoder.decode(wav)
        .getOrElse(fail(s"iter $iter (ch=$ch spb=$spb n=$n): no decode"))
      assert(got.length == n, s"iter $iter length")
      val expected = Array.tabulate(n) { i =>
        (0 until ch).map(c => recon(c)(i) / 32768.0).sum / ch
      }
      assert(got.toSeq == expected.toSeq, s"iter $iter (ch=$ch spb=$spb)")
    }
  }

  test("a smooth signal survives the lossy roundtrip closely (SNR sanity)") {
    val pcm = Array.tabulate(4096)(i => (math.sin(i / 20.0) * 12000).toInt)
    val (wav, _) = AdpcmTestEncoder.encode(Array(pcm), 8000, 505)
    val got = AdpcmDecoder.decode(wav).get
    val err = got.zip(pcm.map(_ / 32768.0)).map { case (a, b) => (a - b) * (a - b) }.sum / got.length
    val sig = pcm.map(v => (v / 32768.0) * (v / 32768.0)).sum / pcm.length
    val snr = 10 * math.log10(sig / err)
    info(f"SNR $snr%.1f dB")
    assert(snr > 20, s"SNR $snr dB too low for a smooth signal")
  }

  test("supports() is disjoint from JavaSoundPcm; builtins route tag 0x11 here") {
    val pcm = signal(512, 3L)
    val (adpcmWav, _) = AdpcmTestEncoder.encode(Array(pcm), 8000, 9)
    assert(AdpcmDecoder.supports(adpcmWav))
    // a plain PCM wav is NOT claimed
    val pcmWav = {
      val out = new ArrayBuffer[Byte]()
      def w16(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
      def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
      def tg(t: String): Unit = t.foreach(c => out += c.toByte)
      tg("RIFF"); w32(36 + pcm.length * 2); tg("WAVE")
      tg("fmt "); w32(16); w16(1); w16(1); w32(8000); w32(16000); w16(2); w16(16)
      tg("data"); w32(pcm.length * 2)
      pcm.foreach(w16)
      out.toArray
    }
    assert(!AdpcmDecoder.supports(pcmWav))
    assert(AudioDecoder.JavaSoundPcm.supports(pcmWav))
    // builtins: first claimant decodes the ADPCM payload
    val dec = AudioDecoder.builtins.find(_.supports(adpcmWav)).get
    assert(dec eq AdpcmDecoder)
    assert(dec.decode(adpcmWav).isDefined)
  }

  test("corruption and truncation degrade to None or garbage, never throw") {
    val pcm = signal(1024, 7L)
    val (wav, _) = AdpcmTestEncoder.encode(Array(pcm), 8000, 17)
    val rng = new scala.util.Random(11L)
    for (_ <- 1 to 200) {
      val c = wav.clone()
      for (_ <- 0 until 1 + rng.nextInt(4))
        c(rng.nextInt(c.length)) = (rng.nextInt(256) - 128).toByte
      AdpcmDecoder.decode(c) // must not throw
    }
    for (len <- 1 until wav.length by 13)
      AdpcmDecoder.decode(java.util.Arrays.copyOf(wav, len))
  }

  test("supports() is total on malformed RIFF — the unguarded routing path (advice-r15)") {
    // supports() runs inside BinaryPipeline task closures with NO
    // try/catch (decode() has one, routing does not), so one truncated
    // WAV in a corpus must not fail the whole job.
    val decoders = Seq[Array[Byte] => Boolean](
      AdpcmDecoder.supports, MsAdpcmDecoder.supports)
    // payload ending exactly at the fmt header: 'RIFF....WAVEfmt ' + size
    val prefix = {
      val out = new ArrayBuffer[Byte]()
      def tg(t: String): Unit = t.foreach(c => out += c.toByte)
      tg("RIFF"); out ++= Array[Byte](0x24, 0, 0, 0); tg("WAVE"); tg("fmt ")
      out.toArray
    }
    for (f <- decoders) {
      assert(!f(prefix)) // 20 bytes: chunk header incomplete
      // declared fmt size 16 but zero payload bytes present
      assert(!f(prefix ++ Array[Byte](16, 0, 0, 0)))
      // declared fmt size 16, ONE payload byte present (clamped to 1 <
      // the 2 bytes u16 reads)
      assert(!f(prefix ++ Array[Byte](16, 0, 0, 0, 0x11)))
      // a non-fmt chunk whose size is near Int.MaxValue: the cursor
      // advance must not overflow negative and loop/read out of bounds
      val huge = {
        val out = new ArrayBuffer[Byte]()
        def tg(t: String): Unit = t.foreach(c => out += c.toByte)
        tg("RIFF"); out ++= Array[Byte](0x24, 0, 0, 0); tg("WAVE")
        tg("JUNK"); out ++= Array[Byte](-1, -1, -1, 0x7f) // 0x7fffffff
        out ++= Array.fill[Byte](64)(0)
        out.toArray
      }
      assert(!f(huge))
    }
    // randomized header fuzz over the whole routing chain
    val rng = new scala.util.Random(23L)
    val pcm = signal(256, 5L)
    val (wav, _) = AdpcmTestEncoder.encode(Array(pcm), 8000, 9)
    for (_ <- 1 to 300) {
      val len = 1 + rng.nextInt(wav.length)
      val c = java.util.Arrays.copyOf(wav, len)
      for (_ <- 0 until 1 + rng.nextInt(6))
        c(rng.nextInt(c.length)) = (rng.nextInt(256) - 128).toByte
      decoders.foreach(f => f(c)) // must not throw
    }
  }
}

/** Test-side Microsoft ADPCM encoder: tables shared (they define the
  * bitstream), quantize/reconstruct arithmetic written independently,
  * reconstruction trace returned — the [[AdpcmTestEncoder]] discipline.
  * Exhaustive 16-nibble search per sample (it is a test encoder; only
  * the DECODER is the product).
  */
object MsAdpcmTestEncoder {
  import graft.operators.multimodal.MsAdpcmDecoder.{AdaptationTable, Coef1, Coef2}

  def encode(channels: Array[Array[Int]], sampleRate: Int,
             samplesPerBlock: Int,
             predictorOf: Int => Int = _ => 0): (Array[Byte], Array[Array[Int]]) = {
    val ch = channels.length
    require(ch >= 1 && channels.forall(_.length == channels(0).length))
    require(samplesPerBlock >= 2 && (samplesPerBlock - 2) * ch % 2 == 0)
    val total = channels(0).length
    val nBlocks = (total + samplesPerBlock - 1) / samplesPerBlock
    val blockAlign = 7 * ch + (samplesPerBlock - 2) * ch / 2
    val recon = Array.fill(ch)(new Array[Int](nBlocks * samplesPerBlock))
    def sampleAt(c: Int, i: Int): Int =
      if (i < total) channels(c)(i) else if (total == 0) 0 else channels(c)(total - 1)

    val data = new ArrayBuffer[Byte]()
    var blk = 0
    while (blk < nBlocks) {
      val s0 = blk * samplesPerBlock
      val p = predictorOf(blk) % 7
      val c1 = Coef1(p); val c2 = Coef2(p)
      val s2 = new Array[Int](ch); val s1 = new Array[Int](ch)
      val delta = new Array[Int](ch)
      for (c <- 0 until ch) {
        s2(c) = sampleAt(c, s0); s1(c) = sampleAt(c, s0 + 1)
        delta(c) = math.max(16,
          math.abs(sampleAt(c, s0 + 2) - s1(c)) / 4 + 16)
        recon(c)(s0) = s2(c)
        recon(c)(s0 + 1) = s1(c)
      }
      for (c <- 0 until ch) data += p.toByte
      for (c <- 0 until ch) { data += (delta(c) & 0xff).toByte; data += ((delta(c) >> 8) & 0xff).toByte }
      for (c <- 0 until ch) { data += (s1(c) & 0xff).toByte; data += ((s1(c) >> 8) & 0xff).toByte }
      for (c <- 0 until ch) { data += (s2(c) & 0xff).toByte; data += ((s2(c) >> 8) & 0xff).toByte }
      // nibbles: high first, channels alternating per nibble
      val nNibbles = (samplesPerBlock - 2) * ch
      var pendingHigh = -1
      var i = 0
      while (i < nNibbles) {
        val c = i % ch
        val si = 2 + i / ch
        val target = sampleAt(c, s0 + si)
        // independent reconstruction arithmetic (toward-zero /256,
        // >>8 delta floor, clamps) — pick the nibble whose decode
        // lands closest to the target
        val predBase = (s1(c) * c1 + s2(c) * c2) / 256
        var bestNib = 0; var bestErr = Long.MaxValue; var bestSample = 0
        var nib = 0
        while (nib < 16) {
          val signed = if (nib >= 8) nib - 16 else nib
          var v = predBase + signed * delta(c)
          if (v > 32767) v = 32767
          if (v < -32768) v = -32768
          val err = math.abs(v.toLong - target)
          if (err < bestErr) { bestErr = err; bestNib = nib; bestSample = v }
          nib += 1
        }
        s2(c) = s1(c); s1(c) = bestSample
        delta(c) = math.max(16, (AdaptationTable(bestNib) * delta(c)) >> 8)
        recon(c)(s0 + si) = bestSample
        if (pendingHigh < 0) pendingHigh = bestNib
        else { data += ((pendingHigh << 4) | bestNib).toByte; pendingHigh = -1 }
        i += 1
      }
      require(pendingHigh < 0, "odd nibble count")
      blk += 1
    }

    val out = new ArrayBuffer[Byte]()
    def w16(v: Int): Unit = { out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    def tg(t: String): Unit = t.foreach(cc => out += cc.toByte)
    tg("RIFF"); w32(4 + 8 + 50 + 8 + data.length); tg("WAVE")
    tg("fmt "); w32(50)
    w16(0x0002); w16(ch); w32(sampleRate)
    w32(sampleRate.toLong * blockAlign / samplesPerBlock)
    w16(blockAlign); w16(4)
    w16(32) // cbSize
    w16(samplesPerBlock); w16(7)
    for (k <- 0 until 7) {
      w16(graft.operators.multimodal.MsAdpcmDecoder.Coef1(k) & 0xffff)
      w16(graft.operators.multimodal.MsAdpcmDecoder.Coef2(k) & 0xffff)
    }
    tg("data"); w32(data.length)
    out ++= data
    (out.toArray, recon)
  }
}

/** Microsoft ADPCM decode (SURVEY §2 #36d, round 15). */
class MsAdpcmSpec extends AnyFunSuite {
  import graft.operators.multimodal.MsAdpcmDecoder

  test("tables carry their structural invariants: symmetry, floor, stability, identity pair") {
    val a = MsAdpcmDecoder.AdaptationTable
    assert(a.length == 16)
    // adaptation depends on nibble magnitude only: a(n) == a(16 - n)
    for (n <- 1 to 7) assert(a(n) == a(16 - n), s"asymmetry at $n")
    assert(a(8) == a.max, "max growth at the largest magnitude")
    assert(a.take(4).forall(_ == 230) && a.min == 230, "shrink floor 230")
    assert(a.zipWithIndex.forall { case (v, i) => i > 8 || i == 0 || v >= a(i - 1) },
      "monotone over positive magnitudes")
    // predictor stability: DC gain (coef1 + coef2)/256 <= 1; pair 0 is
    // the exact identity predictor
    val c1 = MsAdpcmDecoder.Coef1; val c2 = MsAdpcmDecoder.Coef2
    assert(c1.length == 7 && c2.length == 7)
    assert(c1(0) == 256 && c2(0) == 0)
    for (k <- 0 until 7) assert(c1(k) + c2(k) <= 256, s"unstable pair $k")
  }

  private def signal(n: Int, seed: Long, amp: Double = 9000): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n) { i =>
      (math.sin(i / 9.0) * amp + math.sin(i / 2.3) * amp / 4 +
        rnd.nextInt(401) - 200).toInt.max(-32768).min(32767)
    }
  }

  test("fuzz: decode is bit-exact against the encoder's reconstruction trace, all 7 predictors") {
    val rng = new scala.util.Random(20260817L)
    for (iter <- 1 to 60) {
      val ch = 1 + rng.nextInt(2)
      val spb = if (ch == 2) Seq(9, 18, 33)(rng.nextInt(3))
                else Seq(8, 18, 34)(rng.nextInt(3))
      val n = spb * (1 + rng.nextInt(4))
      val pcm = Array.fill(ch)(signal(n, rng.nextLong()))
      val pred = rng.nextInt(7)
      val (wav, recon) = MsAdpcmTestEncoder.encode(pcm, 8000, spb,
        predictorOf = b => (pred + b) % 7)
      val got = MsAdpcmDecoder.decode(wav)
        .getOrElse(fail(s"iter $iter (ch=$ch spb=$spb): no decode"))
      assert(got.length == n, s"iter $iter length")
      val expected = Array.tabulate(n) { i =>
        (0 until ch).map(c => recon(c)(i) / 32768.0).sum / ch
      }
      assert(got.toSeq == expected.toSeq, s"iter $iter (ch=$ch spb=$spb pred=$pred)")
    }
  }

  test("routing: tag 0x02 claimed here, disjoint from IMA and PCM; corruption degrades") {
    import graft.operators.multimodal.{AdpcmDecoder, AudioDecoder}
    val pcm = signal(512, 3L)
    val (msWav, _) = MsAdpcmTestEncoder.encode(Array(pcm), 8000, 34)
    assert(MsAdpcmDecoder.supports(msWav))
    assert(!AdpcmDecoder.supports(msWav))
    assert(AudioDecoder.builtins.find(_.supports(msWav)).get eq MsAdpcmDecoder)
    val (imaWav, _) = AdpcmTestEncoder.encode(Array(pcm), 8000, 9)
    assert(!MsAdpcmDecoder.supports(imaWav))
    val rng = new scala.util.Random(13L)
    for (_ <- 1 to 200) {
      val c = msWav.clone()
      for (_ <- 0 until 1 + rng.nextInt(4))
        c(rng.nextInt(c.length)) = (rng.nextInt(256) - 128).toByte
      MsAdpcmDecoder.decode(c)
    }
    for (len <- 1 until msWav.length by 13)
      MsAdpcmDecoder.decode(java.util.Arrays.copyOf(msWav, len))
  }
}
