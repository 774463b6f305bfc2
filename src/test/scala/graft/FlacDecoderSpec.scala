package graft

import graft.operators.multimodal.{AudioDecoder, BinaryPipeline, FlacDecoder}
import org.scalatest.funsuite.AnyFunSuite
import FlacTestEncoder._

/** Pins [[FlacDecoder]] with [[FlacTestEncoder]] streams (an
  * independently-written encoder — own CRCs, own residual coder) and,
  * for the strongest pin, against `javax.sound` decoding the SAME PCM
  * from a WAV twin: FLAC is lossless, so a FLAC payload and its WAV
  * twin must produce IDENTICAL Double arrays through the
  * [[AudioDecoder]] seam — no tolerance.
  */
class FlacDecoderSpec extends AnyFunSuite {

  /** Deterministic 16-bit test signal: two sines + rough noise. */
  private def signal(n: Int, seed: Long, amp: Double = 12000): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(n) { i =>
      (math.sin(i / 7.0) * amp + math.sin(i / 3.1) * amp / 3 +
        rnd.nextInt(201) - 100).toInt.max(-32768).min(32767)
    }
  }

  private def wavBytes(channels: Array[Array[Int]], rate: Int = 8000): Array[Byte] = {
    val n = channels(0).length
    val ch = channels.length
    val pcm = new Array[Byte](n * 2 * ch)
    for (i <- 0 until n; c <- 0 until ch) {
      val s = channels(c)(i)
      pcm((i * ch + c) * 2) = (s & 0xFF).toByte
      pcm((i * ch + c) * 2 + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, ch, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def decodeFlac(b: Array[Byte]): Array[Double] = {
    val got = FlacDecoder.decode(b)
    assert(got.isDefined, "FLAC decode failed")
    got.get
  }

  test("verbatim mono == WAV twin, sample-exact") {
    val pcm = signal(1000, 1)
    val flac = encode(Array(pcm), bps = 16, sampleRate = 8000, blockSize = 256)
    assert(FlacDecoder.supports(flac))
    val viaFlac = decodeFlac(flac)
    val viaWav = AudioDecoder.JavaSoundPcm.decode(wavBytes(Array(pcm))).get
    assert(viaFlac.toSeq === viaWav.toSeq)
  }

  test("every subframe type roundtrips exactly: constant, fixed 0-4, LPC, escape, partitions, wasted bits") {
    val n = 1024
    val smooth = signal(n, 2, amp = 8000)
    val constant = Array.fill(n)(-1234)
    val expected = (s: Array[Int]) => s.map(_.toDouble / 32768.0).toSeq

    val cases: Seq[(String, Array[Int], (Int, Int) => Sub)] = Seq(
      ("constant", constant, (_, _) => Constant),
      ("fixed0", smooth, (_, _) => Fixed(0)),
      ("fixed1", smooth, (_, _) => Fixed(1)),
      ("fixed2", smooth, (_, _) => Fixed(2)),
      ("fixed3", smooth, (_, _) => Fixed(3)),
      ("fixed4", smooth, (_, _) => Fixed(4)),
      ("fixed2-partitions", smooth, (_, _) => Fixed(2, partOrder = 3)),
      ("fixed1-escape", smooth, (_, _) => Fixed(1, escape = true)),
      ("lpc2", smooth, (_, _) => Lpc(Array(3 << 4, -(1 << 4)), precision = 12, shift = 5)),
      ("lpc4-partitions", smooth,
        (_, _) => Lpc(Array(1000, -400, 120, -30), precision = 12, shift = 9, partOrder = 2)),
      ("wasted3", smooth.map(s => (s >> 3) << 3), (_, _) => Wasted(3, Fixed(1))),
      ("mixed-by-frame", smooth,
        (f, _) => Seq(Verbatim, Fixed(2), Fixed(0, escape = true), Fixed(4, partOrder = 2))(f % 4)))

    cases.foreach { case (name, pcm, sub) =>
      val flac = encode(Array(pcm), bps = 16, sampleRate = 8000,
        blockSize = 256, sub = sub)
      assert(decodeFlac(flac).toSeq === expected(pcm), s"case $name")
    }
  }

  test("stereo: independent, left/side, right/side, mid/side all equal the WAV twin") {
    val l = signal(800, 3)
    val r = signal(800, 4, amp = 9000)
    val viaWav = AudioDecoder.JavaSoundPcm.decode(wavBytes(Array(l, r))).get
    Seq(Independent, LeftSide, RightSide, MidSide).foreach { mode =>
      val flac = encode(Array(l, r), bps = 16, sampleRate = 8000,
        blockSize = 192, stereo = mode, sub = (_, _) => Fixed(2))
      assert(decodeFlac(flac).toSeq === viaWav.toSeq, s"mode $mode")
    }
  }

  test("multichannel independent (4ch) averages like the PCM arithmetic") {
    val chans = Array(signal(300, 5), signal(300, 6), signal(300, 7), signal(300, 8))
    val flac = encode(chans, bps = 16, sampleRate = 8000, blockSize = 128)
    val want = (0 until 300).map { i =>
      chans.map(_(i).toDouble / 32768.0).sum / 4
    }
    assert(decodeFlac(flac).toSeq === want)
  }

  test("8-bit and 24-bit depths normalize by 2^(bps-1)") {
    val pcm8 = Array.tabulate(500)(i => ((i * 37) % 200) - 100)
    val flac8 = encode(Array(pcm8), bps = 8, sampleRate = 8000, blockSize = 250)
    assert(decodeFlac(flac8).toSeq === pcm8.map(_.toDouble / 128.0).toSeq)

    val pcm24 = Array.tabulate(500)(i =>
      (math.sin(i / 11.0) * 4000000).toInt)
    val flac24 = encode(Array(pcm24), bps = 24, sampleRate = 8000,
      blockSize = 250, sub = (_, _) => Fixed(2))
    assert(decodeFlac(flac24).toSeq === pcm24.map(_.toDouble / 8388608.0).toSeq)
  }

  test("multi-byte coded frame numbers (>=128 frames) decode") {
    val pcm = signal(192 * 130, 9, amp = 500)
    val flac = encode(Array(pcm), bps = 16, sampleRate = 8000, blockSize = 192)
    assert(decodeFlac(flac).length === pcm.length)
    assert(decodeFlac(flac).toSeq === pcm.map(_.toDouble / 32768.0).toSeq)
  }

  test("corruption and truncation degrade to None, never throw") {
    val pcm = signal(600, 10)
    val flac = encode(Array(pcm), bps = 16, sampleRate = 8000, blockSize = 256,
      sub = (_, _) => Fixed(2))
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      val broken = flac.clone()
      broken(rnd.nextInt(broken.length)) =
        (broken(rnd.nextInt(broken.length)) ^ (1 << rnd.nextInt(8))).toByte
      FlacDecoder.decode(broken) // must not throw; None or a valid decode
    }
    (1 until 20).foreach { cut =>
      assert(FlacDecoder.decode(flac.take(flac.length - cut)).isEmpty,
        s"truncated by $cut must fail the frame CRC")
    }
    // CRC actually bites: flip one bit in the middle of a frame body
    val mid = flac.clone()
    mid(mid.length / 2) = (mid(mid.length / 2) ^ 0x10).toByte
    assert(FlacDecoder.decode(mid).isEmpty)
  }

  test("supports() gates on the fLaC magic only; builtins stay disjoint") {
    val pcm = signal(100, 12)
    assert(!FlacDecoder.supports(wavBytes(Array(pcm))))
    assert(!AudioDecoder.JavaSoundPcm.supports(
      encode(Array(pcm), 16, 8000, 100)))
    assert(FlacDecoder.decode("junk".getBytes("UTF-8")).isEmpty)
    assert(FlacDecoder.decode(wavBytes(Array(pcm))).isEmpty)
  }

  test("embedAudio: FLAC payload rides the built-ins and embeds identically to its WAV twin") {
    import TestSpark.spark
    import spark.implicits._
    val pcm = signal(4000, 13)
    val media = Seq(
      (0L, "audio", wavBytes(Array(pcm))),
      (1L, "audio", encode(Array(pcm), bps = 16, sampleRate = 8000,
        blockSize = 1024, sub = (_, _) => Fixed(2))))
      .toDF("doc_id", "media_type", "data")
    val vecs = BinaryPipeline.embedAudio(spark, media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs.keySet === Set(0L, 1L))
    assert(vecs(0L) === vecs(1L), "lossless: identical embeddings")
  }

  test("STREAMINFO total-samples cap and short-stream mismatch degrade to None") {
    val pcm = signal(300, 14)
    // stream claims more samples than its frames carry
    val overlong = encode(Array(pcm), bps = 16, sampleRate = 8000,
      blockSize = 128, totalSamplesOverride = 100000L)
    assert(FlacDecoder.decode(overlong).isEmpty)
    // unknown total (0) falls back to what the frames carry
    val unknown = encode(Array(pcm), bps = 16, sampleRate = 8000,
      blockSize = 128, totalSamplesOverride = 0L)
    assert(decodeFlac(unknown).length === 300)
  }

  test("frame-header bps disagreeing with STREAMINFO degrades to None") {
    // RFC 9639 §9.1.3: the frame's coded sample size must match
    // STREAMINFO. A spec-invalid stream whose frames honestly code
    // 8-bit samples under a 12-bit STREAMINFO would otherwise decode
    // cleanly (CRCs pass — they cover bytes, not interpretation) at
    // 1/16th the true amplitude. advice-r14.
    val pcm = signal(256, 7, amp = 20) // ±20+7+100 < 128: fits 8 bits
    val bad = encode(Array(pcm), bps = 8, sampleRate = 8000,
      blockSize = 128, siBpsOverride = 12)
    assert(FlacDecoder.decode(bad).isEmpty)
    // sanity: the same stream without the override decodes
    val good = encode(Array(pcm), bps = 8, sampleRate = 8000, blockSize = 128)
    assert(decodeFlac(good).length === 256)
  }
}
