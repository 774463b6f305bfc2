package graft

import graft.operators.multimodal.{BinaryPipeline, ContainerProbe}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM video container probe (SURVEY §2 #36): MP4/ISO-BMFF and
  * AVI/RIFF headers hand-crafted in-test, byte-exact to the specs the
  * parser reads.
  */
class ContainerProbeSpec extends AnyFunSuite {

  // ---- ISO BMFF construction helpers (BE sizes) ----
  private def box(tag: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length)
    bb.put(tag.getBytes("US-ASCII"))
    bb.put(body)
    bb.array
  }
  private def be32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array

  /** tkhd payload per ISO 14496-12 §8.3.2: version/flags +
    * version-dependent time/id block (20 bytes v0, 32 bytes v1) + the
    * fixed 52-byte reserved/layer/volume/matrix block + 16.16-fixed
    * width/height — 84 payload bytes total for v0, matching real
    * muxer output byte-for-byte.
    */
  private def tkhd(w: Int, h: Int, version: Int): Array[Byte] = {
    val times = new Array[Byte](if (version == 1) 32 else 20)
    Array[Byte](version.toByte, 0, 0, 0) ++ times ++ new Array[Byte](52) ++
      be32(w << 16) ++ be32(h << 16)
  }
  private def stsz(sampleCount: Int): Array[Byte] =
    box("stsz", new Array[Byte](4), be32(0), be32(sampleCount))

  private def mp4(w: Int, h: Int, frames: Int, tkhdVersion: Int = 0): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes)
    // an audio track first — 0x0 dims, no stsz — which the probe must skip
    val audioTrak = box("trak", box("tkhd", tkhd(0, 0, 0)))
    val videoTrak = box("trak",
      box("tkhd", tkhd(w, h, tkhdVersion)),
      box("mdia", box("minf", box("stbl", stsz(frames)))))
    ftyp ++ box("moov", audioTrak, videoTrak) ++ box("mdat", new Array[Byte](16))
  }

  // ---- RIFF construction helpers (LE sizes) ----
  private def le32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array
  private def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    tag.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
  }
  private def avi(w: Int, h: Int, frames: Int): Array[Byte] = {
    // AVIMAINHEADER: 56 bytes; dwTotalFrames at +16, dwWidth/dwHeight at +32/+36
    val avih = new Array[Byte](56)
    System.arraycopy(le32(frames), 0, avih, 16, 4)
    System.arraycopy(le32(w), 0, avih, 32, 4)
    System.arraycopy(le32(h), 0, avih, 36, 4)
    // an odd-length junk chunk BEFORE hdrl exercises even-padding math
    val body = "AVI ".getBytes ++ chunk("JUNK", new Array[Byte](7)) ++
      chunk("LIST", "hdrl".getBytes ++ chunk("avih", avih))
    "RIFF".getBytes ++ le32(body.length) ++ body
  }

  test("tkhd construction matches the spec'd real-world box sizes (92 bytes v0, 104 v1)") {
    // pins the layout constants to ISO 14496-12 §8.3.2's known box
    // sizes so the parser and the test generator cannot drift together
    assert(box("tkhd", tkhd(320, 240, 0)).length == 92)
    assert(box("tkhd", tkhd(320, 240, 1)).length == 104)
  }

  test("MP4: tkhd dims + stsz frame count, audio track skipped (v0 and v1 tkhd)") {
    assert(ContainerProbe.probe(mp4(320, 240, 90)) == Some((320, 240, 90)))
    assert(ContainerProbe.probe(mp4(1920, 1080, 7, tkhdVersion = 1)) ==
      Some((1920, 1080, 7)))
  }

  test("MP4: video track without stsz still yields dims with frames=1") {
    val noStbl = box("ftyp", "isom".getBytes, be32(0)) ++
      box("moov", box("trak", box("tkhd", tkhd(64, 48, 0))))
    assert(ContainerProbe.probe(noStbl) == Some((64, 48, 1)))
  }

  test("AVI: avih width/height/total frames through LIST nesting and odd-chunk padding") {
    assert(ContainerProbe.probe(avi(640, 360, 120)) == Some((640, 360, 120)))
  }

  test("garbage, text, and truncated payloads all refuse cleanly") {
    assert(ContainerProbe.probe("The quick brown fox jumps over it".getBytes).isEmpty)
    assert(ContainerProbe.probe(Array.empty[Byte]).isEmpty)
    assert(ContainerProbe.probe("RIFF".getBytes).isEmpty)
    // valid magic, truncated before the header chunk completes
    assert(ContainerProbe.probe(avi(640, 360, 120).take(40)).isEmpty)
    assert(ContainerProbe.probe(mp4(320, 240, 90).take(30)).isEmpty)
    // a leading box with an absurd size (prose read as BE u32) must not walk
    val lying = be32(Int.MaxValue) ++ "moov".getBytes ++ new Array[Byte](32)
    assert(ContainerProbe.probe(lying).isEmpty)
  }

  test("fuzz: arbitrary, truncated, and bit-flipped payloads never throw, outputs stay positive") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sane = (r: Option[(Int, Int, Int)]) =>
      r.forall { case (w, h, f) => w > 0 && h > 0 && f > 0 }
    val arbitrary = Prop.forAll(Gen.containerOf[Array, Byte](
      Gen.choose(Byte.MinValue, Byte.MaxValue)))(d => sane(ContainerProbe.probe(d)))
    // mutations of REAL headers probe the parser's deep paths: random
    // truncation and byte flips over valid MP4/AVI bytes
    val valid = Gen.oneOf(mp4(320, 240, 90), avi(640, 360, 120))
    val mutated = Prop.forAll(valid, Gen.choose(0, 200), Gen.choose(0, 255)) {
      (orig, pos, b) =>
        val cut = orig.take(math.min(pos, orig.length))
        val flipped = orig.clone()
        if (flipped.nonEmpty) flipped(pos % flipped.length) = b.toByte
        sane(ContainerProbe.probe(cut)) && sane(ContainerProbe.probe(flipped))
    }
    val params = SCTest.Parameters.default.withMinSuccessfulTests(500)
    assert(SCTest.check(params, arbitrary).passed, "arbitrary-bytes fuzz failed")
    assert(SCTest.check(params, mutated).passed, "mutated-header fuzz failed")
  }

  test("end-to-end: real container bytes decode in extractMeta; text stays stubbed") {
    val spark = TestSpark.spark
    import spark.implicits._
    val media = Seq(
      (0L, "video", avi(640, 360, 120)),
      (1L, "video", mp4(320, 240, 90)),
      (2L, "video", "just some prose standing in for a payload".getBytes("UTF-8")))
      .toDF("doc_id", "media_type", "data")
    val meta = BinaryPipeline.extractMeta(spark, media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(0L).decoded && meta(0L).width == 640 && meta(0L).height == 360 &&
      meta(0L).n_frames == 120)
    assert(meta(1L).decoded && meta(1L).width == 320 && meta(1L).height == 240 &&
      meta(1L).n_frames == 90)
    // the synthetic-corpus path: prose never parses as a container, so
    // the stub arithmetic the oracle mirrors stays in force
    assert(!meta(2L).decoded)
  }
}
