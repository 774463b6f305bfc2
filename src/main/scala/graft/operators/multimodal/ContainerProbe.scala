package graft.operators.multimodal

import graft.operators.multimodal.BinaryPipeline.FrameProber

/** REAL video-container metadata probe, pure JVM: parses the two
  * mainstream container layouts directly from the payload bytes —
  * no codec library, no raster decode, same header-only philosophy as
  * [[BinaryPipeline.imageDims]].
  *
  *  - **MP4 / ISO BMFF** (ISO 14496-12): walks the box tree
  *    `moov → trak → tkhd` for the track's 16.16-fixed width/height and
  *    `trak → mdia → minf → stbl → stsz` for the sample (frame) count.
  *    The video track is the one whose `tkhd` carries nonzero display
  *    dimensions; audio tracks carry 0×0.
  *  - **AVI / RIFF**: walks RIFF chunks to the `hdrl` LIST's `avih`
  *    main header — `dwWidth`/`dwHeight`/`dwTotalFrames` at fixed
  *    little-endian offsets.
  *
  * Every size field is bounds-checked against the payload before use:
  * a truncated, corrupt, or non-video payload returns `None` and the
  * pipeline falls back to the stub flagged `decoded = false`, so a bad
  * file degrades a row instead of failing a partition. Text bytes can
  * never false-positive: AVI needs the literal `RIFF…AVI ` magic, and
  * the MP4 walk requires a well-formed leading box whose type is in the
  * BMFF vocabulary AND a `moov/trak/tkhd` chain — ASCII prose read as a
  * big-endian box size overflows the payload on the first step.
  *
  * What stays out of scope without a codec: pixel data. Frame RASTER
  * extraction still needs an ffmpeg/JCodec adapter implementing
  * [[BinaryPipeline.FrameProber]]; this object makes the metadata leg
  * (dims, frame count — what `multimodal_meta`/`multimodal_frames`
  * consume) real for the two dominant container formats.
  */
object ContainerProbe extends FrameProber {

  def probe(data: Array[Byte]): Option[(Int, Int, Int)] =
    scala.util.Try(probeAvi(data).orElse(probeMp4(data))).toOption.flatten

  // ---------------------------------------------------------------- AVI

  private def le32(d: Array[Byte], off: Int): Long =
    (d(off) & 0xffL) | (d(off + 1) & 0xffL) << 8 |
      (d(off + 2) & 0xffL) << 16 | (d(off + 3) & 0xffL) << 24

  private def fourcc(d: Array[Byte], off: Int, tag: String): Boolean =
    off + 4 <= d.length &&
      d(off) == tag(0).toByte && d(off + 1) == tag(1).toByte &&
      d(off + 2) == tag(2).toByte && d(off + 3) == tag(3).toByte

  /** Depth-first RIFF chunk walk for the first WELL-SIZED `avih`
    * payload offset (the 56-byte AVIMAINHEADER needs at least 40 bytes
    * for the fields we read — a shorter declared size would send the
    * field reads into the NEXT sibling chunk's bytes, so it is skipped,
    * not read). Chunks are fourcc + LE u32 size + data (padded to
    * even); `LIST` chunks nest after a 4-byte list type. `depth` bounds
    * the recursion: a corrupt payload nesting thousands of LISTs must
    * refuse, not StackOverflowError through the Try (fatal errors pass
    * NonFatal).
    */
  private def findAvih(d: Array[Byte], start: Int, end: Int,
                       depth: Int = 16): Option[Int] = {
    if (depth <= 0) return None
    var off = start
    while (off + 8 <= end) {
      val size = le32(d, off + 4)
      val dataStart = off + 8
      val dataEnd = dataStart + size
      if (dataEnd > end) return None // truncated/corrupt
      if (fourcc(d, off, "avih") && size >= 40) return Some(dataStart)
      if (fourcc(d, off, "LIST") && size >= 4) {
        val hit = findAvih(d, dataStart + 4, dataEnd.toInt, depth - 1)
        if (hit.isDefined) return hit
      }
      off = dataEnd.toInt + (size.toInt & 1) // chunks pad to even length
    }
    None
  }

  /** `avih` layout (AVIMAINHEADER): dwTotalFrames at +16, dwWidth at
    * +32, dwHeight at +36 — all LE u32.
    */
  private def probeAvi(d: Array[Byte]): Option[(Int, Int, Int)] = {
    if (d.length < 12 || !fourcc(d, 0, "RIFF") || !fourcc(d, 8, "AVI "))
      return None
    val riffEnd = math.min(d.length.toLong, 8L + le32(d, 4)).toInt
    // findAvih guarantees the chunk declares >= 40 bytes, so the reads
    // below stay inside the avih chunk itself, never a sibling's bytes
    findAvih(d, 12, riffEnd).flatMap { a =>
      val frames = le32(d, a + 16) // u32: clamp before the Int narrowing
      val w = le32(d, a + 32)
      val h = le32(d, a + 36)
      if (w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue)
        Some((w.toInt, h.toInt,
          math.min(math.max(1L, frames), Int.MaxValue.toLong).toInt))
      else None
    }
  }

  // ---------------------------------------------------------------- MP4

  private def be32(d: Array[Byte], off: Int): Long =
    (d(off) & 0xffL) << 24 | (d(off + 1) & 0xffL) << 16 |
      (d(off + 2) & 0xffL) << 8 | (d(off + 3) & 0xffL)

  /** Leading-box types that mark a plausible BMFF file — the gate that
    * keeps arbitrary binary from entering the box walk at all.
    */
  private val LeadingBoxTypes =
    Set("ftyp", "styp", "moov", "mdat", "free", "skip", "wide", "moof", "pdin")

  private def boxType(d: Array[Byte], off: Int): String =
    new String(d, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (payloadStart, boxEnd) for the box at `off`, bounds-checked;
    * handles the 64-bit `size == 1` largesize form. None ends the walk.
    */
  private def boxBounds(d: Array[Byte], off: Int, end: Int): Option[(Int, Int)] = {
    if (off + 8 > end) return None
    val size32 = be32(d, off)
    if (size32 == 1) {
      if (off + 16 > end) return None
      val size64 = (be32(d, off + 8) << 32) | be32(d, off + 12)
      if (size64 < 16 || off + size64 > end) None
      else Some((off + 16, (off + size64).toInt))
    } else if (size32 == 0) { // "to end of file"
      Some((off + 8, end))
    } else if (size32 < 8 || off + size32 > end) None
    else Some((off + 8, (off + size32).toInt))
  }

  /** First child box named `tag` inside [start, end). */
  private def child(d: Array[Byte], start: Int, end: Int,
                    tag: String): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      boxBounds(d, off, end) match {
        case Some((payload, boxEnd)) =>
          if (boxType(d, off) == tag) return Some((payload, boxEnd))
          off = boxEnd
        case None => return None
      }
    }
    None
  }

  /** `tkhd`: width/height as 16.16 fixed point, offset past the
    * version-dependent time fields (v0 times are u32, v1 u64) and the
    * fixed 52-byte block between duration and width — reserved[2] (8)
    * + layer (2) + alternate_group (2) + volume (2) + reserved (2) +
    * matrix[9] (36), per ISO 14496-12 §8.3.2 (a spec-conformant v0
    * tkhd payload is exactly 84 bytes).
    */
  private def tkhdDims(d: Array[Byte], payload: Int, end: Int): Option[(Int, Int)] = {
    if (payload >= end) return None
    val version = d(payload) & 0xff
    // only v0/v1 exist (ISO 14496-12); any other version byte is
    // corruption — refuse rather than read plausible garbage from the
    // v0 offsets, matching the parser's refuse-on-corrupt philosophy
    if (version != 0 && version != 1) return None
    val whOff = payload + 4 + (if (version == 1) 32 else 20) + 52
    if (whOff + 8 > end) None
    else {
      val w = (be32(d, whOff) >> 16).toInt
      val h = (be32(d, whOff + 4) >> 16).toInt
      if (w > 0 && h > 0) Some((w, h)) else None
    }
  }

  /** `stsz` sample_count (sample_size at +4 may be fixed or 0; the
    * count at +8 is authoritative either way).
    */
  private def stszCount(d: Array[Byte], payload: Int, end: Int): Option[Int] =
    if (payload + 12 > end) None
    else {
      val n = be32(d, payload + 8)
      if (n >= 0 && n <= Int.MaxValue) Some(n.toInt) else None
    }

  private def probeMp4(d: Array[Byte]): Option[(Int, Int, Int)] = {
    // gate: the FIRST box must parse cleanly and carry a known type
    val lead = boxBounds(d, 0, d.length)
    if (lead.isEmpty || !LeadingBoxTypes.contains(boxType(d, 0))) return None
    // top-level walk to moov
    var off = 0
    var moov: Option[(Int, Int)] = None
    while (moov.isEmpty && off + 8 <= d.length) {
      boxBounds(d, off, d.length) match {
        case Some((payload, boxEnd)) =>
          if (boxType(d, off) == "moov") moov = Some((payload, boxEnd))
          off = boxEnd
        case None => return None
      }
    }
    moov.flatMap { case (mStart, mEnd) =>
      // scan every trak; the video track is the one with nonzero dims
      var off = mStart
      var found: Option[(Int, Int, Int)] = None
      while (found.isEmpty && off + 8 <= mEnd) {
        boxBounds(d, off, mEnd) match {
          case Some((payload, boxEnd)) =>
            if (boxType(d, off) == "trak") {
              val dims = child(d, payload, boxEnd, "tkhd")
                .flatMap { case (p, e) => tkhdDims(d, p, e) }
              val frames = child(d, payload, boxEnd, "mdia")
                .flatMap { case (p, e) => child(d, p, e, "minf") }
                .flatMap { case (p, e) => child(d, p, e, "stbl") }
                .flatMap { case (p, e) => child(d, p, e, "stsz") }
                .flatMap { case (p, e) => stszCount(d, p, e) }
              found = dims.map { case (w, h) =>
                (w, h, math.max(1, frames.getOrElse(1)))
              }
            }
            off = boxEnd
          case None => return found
        }
      }
      found
    }
  }
}
