package graft

import graft.operators.multimodal.{AudioDecoder, AdpcmDecoder, BinaryPipeline,
  FlacDecoder, Mp3Decoder, MsAdpcmDecoder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Header-only audio metadata probes (round 17): `probeFrames` must
  * report, WITHOUT decoding audio data, exactly the sample count
  * `decode` materializes for a stream it accepts — the twin equality
  * that makes extractMeta's `n_frames` a real number instead of the
  * stub, for every container the repo decodes (WAV/AIFF via
  * javax.sound, FLAC STREAMINFO, IMA/MS ADPCM block arithmetic, MP3
  * frame-header walk).
  */
class AudioProbeSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def sine(n: Int): Array[Int] =
    Array.tabulate(n)(i => (8000 * math.sin(2 * math.Pi * 440 * i / 8000.0)).toInt)

  private def probeOf(d: Array[Byte]): Option[Long] =
    AudioDecoder.builtins.find(_.supports(d)).flatMap(_.probeFrames(d))

  test("FLAC: probeFrames == STREAMINFO total == decode length") {
    val flac = FlacTestEncoder.encode(Array(sine(2000)), 16, 8000, 256,
      sub = (_, _) => FlacTestEncoder.Fixed(2))
    assert(FlacDecoder.probeFrames(flac) == Some(2000L))
    assert(FlacDecoder.decode(flac).get.length == 2000)
    assert(probeOf(flac) == Some(2000L), "builtins routing must reach FlacDecoder")
  }

  test("IMA ADPCM: probeFrames == block arithmetic == decode length") {
    val (ima, _) = AdpcmTestEncoder.encode(Array(sine(2000)), 8000, 505)
    val n = AdpcmDecoder.decode(ima).get.length
    assert(AdpcmDecoder.probeFrames(ima) == Some(n.toLong))
    assert(n >= 2000, "padded to whole blocks")
  }

  test("MS ADPCM: probeFrames == block arithmetic == decode length") {
    val (ms, _) = MsAdpcmTestEncoder.encode(Array(sine(2000)), 8000, 500)
    val n = MsAdpcmDecoder.decode(ms).get.length
    assert(MsAdpcmDecoder.probeFrames(ms) == Some(n.toLong))
  }

  test("MP3: probeFrames == frame walk == decode length; total on an uncarried-table stream shape") {
    val g = () => Mp3Fixture.Gr(is = Array.tabulate(576)(i => if (i < 32) 1 - 2 * (i % 2) else 0),
      bigValues = 16)
    val mp3 = Mp3Fixture.encode(Seq.fill(3)(
      Mp3Fixture.Frame(Array(Array(g()), Array(g())))))
    assert(Mp3Decoder.probeFrames(mp3) == Some(3 * 1152L))
    assert(Mp3Decoder.decode(mp3).get.length == 3 * 1152)
    // the probe never touches Huffman data, so a stream the decoder
    // would refuse (truncated mid-frame) still yields the full frames
    // that fit
    val truncated = mp3.take(mp3.length - 10)
    val p = Mp3Decoder.probeFrames(truncated)
    assert(p == Some(2 * 1152L), s"last partial frame excluded: $p")
  }

  test("WAV via JavaSoundPcm.probeFrames matches decodeWav (headers only)") {
    // minimal PCM16 RIFF writer, same layout as MultimodalBench's
    val s = sine(1234)
    val o = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = (0 until 4).foreach(i => o.write(((v >> (8 * i)) & 0xFF).toInt))
    def le16(v: Int): Unit = { o.write(v & 0xFF); o.write((v >> 8) & 0xFF) }
    o.write("RIFF".getBytes); le32(36L + s.length * 2); o.write("WAVE".getBytes)
    o.write("fmt ".getBytes); le32(16); le16(1); le16(1)
    le32(8000); le32(16000); le16(2); le16(16)
    o.write("data".getBytes); le32(s.length * 2L)
    s.foreach(v => le16(v & 0xFFFF))
    val wav = o.toByteArray
    assert(AudioDecoder.JavaSoundPcm.probeFrames(wav) == Some(1234L))
    assert(BinaryPipeline.decodeWav(wav) == Some(1234))
  }

  test("extractMeta: FLAC/ADPCM/MP3 audio rows now report decoded=true with real n_frames; stub text stays flagged") {
    val s = spark
    import s.implicits._
    val flac = FlacTestEncoder.encode(Array(sine(2000)), 16, 8000, 256,
      sub = (_, _) => FlacTestEncoder.Fixed(2))
    val (ima, _) = AdpcmTestEncoder.encode(Array(sine(2000)), 8000, 505)
    val imaN = AdpcmDecoder.decode(ima).get.length
    val g = Mp3Fixture.Gr(is = Array.tabulate(576)(i => if (i < 32) 1 else 0),
      bigValues = 16)
    val mp3 = Mp3Fixture.encode(Seq(
      Mp3Fixture.Frame(Array(Array(g), Array(g)))))
    val rows = Seq(
      (1L, "audio", flac), (2L, "audio", ima), (3L, "audio", mp3),
      (4L, "audio", "not audio at all, just text bytes".getBytes("UTF-8")))
      .toDF("doc_id", "media_type", "data")
    val meta = BinaryPipeline.extractMeta(spark, rows)
      .collect().map(m => m.doc_id -> ((m.n_frames, m.decoded))).toMap
    assert(meta(1L) == ((2000, true)), s"flac: ${meta(1L)}")
    assert(meta(2L) == ((imaN, true)), s"ima: ${meta(2L)}")
    assert(meta(3L) == ((1152, true)), s"mp3: ${meta(3L)}")
    assert(!meta(4L)._2, "undecodable payloads keep the flagged stub")
  }
}
