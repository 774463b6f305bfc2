package graft.operators.multimodal

import java.awt.image.BufferedImage

/** REAL video frame-raster extraction, pure JVM, for the two AVI codec
  * layouts the JDK can decode without an external library:
  *
  *  - **Motion-JPEG** (`strh` handler / `strf` biCompression `MJPG`):
  *    every `00dc` chunk in the `movi` LIST is a complete JPEG image —
  *    `javax.imageio` decodes it directly. This is the canonical MJPEG
  *    container layout (digital cameras, capture cards).
  *  - **Uncompressed DIB** (`biCompression == 0`, BI_RGB, 24 bpp):
  *    frame chunks are bottom-up BGR rasters with 4-byte-aligned rows —
  *    decoded by hand, exactly (no codec involved at all).
  *
  * Compressed inter-frame codecs (H.264/H.265/VP9…) genuinely need an
  * external decoder: they plug in through the [[FrameDecoder]] seam —
  * the container walk below is codec-independent and hands each frame
  * chunk to the first decoder claiming the stream's format, so an
  * ffmpeg/JNI adapter is a drop-in beside the two pure-JDK built-ins
  * (the same line [[BinaryPipeline.imageDims]]/[[ContainerProbe]] draw
  * for images and container metadata).
  *
  * Structure per the public AVI/RIFF layout (AVIMAINHEADER 56 bytes,
  * AVISTREAMHEADER 56 bytes, BITMAPINFOHEADER 40 bytes; video chunks in
  * `movi` are `##dc`/`##db` with `##` the two-digit stream index, chunks
  * padded to even length, `rec ` LISTs may nest frame chunks one level).
  * Every size field is bounds-checked; corrupt payloads yield an empty
  * iterator, never a thrown partition.
  */
object AviFrames {

  /** Video stream format from the `hdrl` LIST: codec fourcc (from
    * biCompression; 0 → "DIB "), dimensions, bit depth, the stream's
    * declaration index (= its `movi` chunk id), and row order (BI_RGB
    * rasters are bottom-up unless the header declared negative height).
    */
  final case class VideoFormat(codec: String, width: Int, height: Int,
                               bitCount: Int, streamIndex: Int,
                               topDown: Boolean)

  private def le32(d: Array[Byte], off: Int): Long =
    (d(off) & 0xffL) | (d(off + 1) & 0xffL) << 8 |
      (d(off + 2) & 0xffL) << 16 | (d(off + 3) & 0xffL) << 24

  private def le32i(d: Array[Byte], off: Int): Int = le32(d, off).toInt

  private def le16(d: Array[Byte], off: Int): Int =
    (d(off) & 0xff) | (d(off + 1) & 0xff) << 8

  private def fourcc(d: Array[Byte], off: Int, tag: String): Boolean =
    off + 4 <= d.length &&
      d(off) == tag(0).toByte && d(off + 1) == tag(1).toByte &&
      d(off + 2) == tag(2).toByte && d(off + 3) == tag(3).toByte

  private def tagAt(d: Array[Byte], off: Int): String =
    new String(d, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk chunks in [start, end); invoke `f` with (tag, dataStart,
    * dataEnd) per chunk; recurse into LISTs (bounded depth). `f`
    * returning false stops the walk early.
    */
  private def walkChunks(d: Array[Byte], start: Int, end: Int, depth: Int)
                        (f: (String, Int, Int) => Boolean): Boolean = {
    if (depth <= 0) return true
    var off = start
    while (off + 8 <= end) {
      val size = le32(d, off + 4)
      val dataStart = off + 8
      val dataEnd = dataStart + size
      if (dataEnd > end) return true // truncated/corrupt: stop cleanly
      val tag = tagAt(d, off)
      if (tag == "LIST" && size >= 4) {
        if (!walkChunks(d, dataStart + 4, dataEnd.toInt, depth - 1)(f))
          return false
      } else if (!f(tag, dataStart, dataEnd.toInt)) return false
      off = dataEnd.toInt + (size.toInt & 1) // pad to even
    }
    true
  }

  /** Parse the first `vids` stream's format out of the `hdrl` headers.
    * Streams appear as `strl` LISTs in declaration order; the chunk ids
    * in `movi` use that order, so the index is counted here.
    */
  def videoFormat(d: Array[Byte]): Option[VideoFormat] = {
    if (d.length < 12 || !fourcc(d, 0, "RIFF") || !fourcc(d, 8, "AVI "))
      return None
    val riffEnd = math.min(d.length.toLong, 8L + le32(d, 4)).toInt
    var streamIdx = -1
    var sawVids = false
    var result: Option[VideoFormat] = None
    walkChunks(d, 12, riffEnd, 16) { (tag, s, e) =>
      tag match {
        case "strh" if e - s >= 8 =>
          streamIdx += 1
          sawVids = fourcc(d, s, "vids")
          true
        case "strf" if sawVids && e - s >= 40 && result.isEmpty =>
          // BITMAPINFOHEADER: biWidth i32@4, biHeight i32@8,
          // biBitCount u16@14, biCompression u32@16
          val w = le32i(d, s + 4)
          val h = le32i(d, s + 8) // negative = top-down raster
          val bits = le16(d, s + 14)
          val comp = le32(d, s + 16)
          val codec =
            if (comp == 0L) "DIB "
            else new String(Array(
              (comp & 0xff).toByte, (comp >> 8 & 0xff).toByte,
              (comp >> 16 & 0xff).toByte, (comp >> 24 & 0xff).toByte),
              java.nio.charset.StandardCharsets.US_ASCII)
          if (w > 0 && math.abs(h) > 0)
            result = Some(VideoFormat(codec, w, math.abs(h), bits, streamIdx,
              topDown = h < 0))
          false // format found (or malformed): stop the header walk
        case _ => true
      }
    }
    result
  }

  /** Every `stride`-th decodable frame raster of the payload's video
    * stream as (frame_idx, raster), materialized eagerly per row (a
    * video payload that fits a binary cell fits its decoded strided
    * frames; rows stream per partition, so executor memory holds one
    * row's frames at a time). Empty for payloads that aren't AVI, carry
    * a codec none of `decoders` reads, or are corrupt — callers fall
    * back to the stub/adapter path exactly like undecodable images.
    *
    * The container walk here is codec-independent; per-chunk decoding
    * is delegated to the first [[FrameDecoder]] claiming the stream's
    * format — [[FrameDecoder.builtins]] (MJPEG + DIB, pure JDK) by
    * default, with compressed-codec adapters (H.264…) plugged in by
    * the caller.
    */
  def videoFrames(data: Array[Byte], stride: Int = 1,
                  maxFrames: Int = 1024,
                  decoders: Seq[FrameDecoder] = FrameDecoder.builtins)
      : Seq[(Int, BufferedImage)] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    (for {
      fmt <- videoFormat(data)
      dec <- decoders.find(_.supports(fmt))
    } yield {
      val chunkTagDc = f"${fmt.streamIndex}%02ddc"
      val chunkTagDb = f"${fmt.streamIndex}%02ddb"
      val riffEnd = math.min(data.length.toLong, 8L + le32(data, 4)).toInt
      val out = Seq.newBuilder[(Int, BufferedImage)]
      var idx = 0
      var taken = 0
      walkChunks(data, 12, riffEnd, 16) { (tag, s, e) =>
        if (tag == chunkTagDc || tag == chunkTagDb) {
          if (idx % stride == 0 && e > s)
            dec.decode(data, s, e, fmt).foreach { i =>
              out += ((idx, i)); taken += 1
            }
          idx += 1
        }
        taken < maxFrames
      }
      out.result()
    }).getOrElse(Seq.empty)
  }
}
