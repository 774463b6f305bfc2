package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column pipeline (SURVEY §2 #36).
  *
  * Media payloads are opaque `binary` columns with typed metadata
  * alongside — the plumbing a 100 TB image/audio/video corpus needs:
  * a stable row schema, per-partition batch iteration (one decoder
  * instance per partition, not per row), and a metadata projection
  * that never materializes payloads on the driver.
  *
  * ┌─ STUB ─────────────────────────────────────────────────────────┐
  * │ The image/audio libraries are not in this container, so        │
  * │ [[decodeStub]] is a DETERMINISTIC FAKE decoder: it derives     │
  * │ width/height/frame-count arithmetically from the payload size. │
  * │ A real deployment swaps in e.g. javax.imageio / ffmpeg here —  │
  * │ the Dataset schema, mapPartitions batching, and partitioning   │
  * │ are the real, tested part.                                     │
  * └────────────────────────────────────────────────────────────────┘
  */
object BinaryPipeline {

  /** Input row: id + modality tag + opaque payload. */
  final case class RawMedia(doc_id: Long, media_type: String, data: Array[Byte])

  /** Output row: decoded metadata, payload dropped. */
  final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                             magic_hex: String, width: Int, height: Int,
                             n_frames: Int)

  /** Build a media table from `documents`: UTF-8 bytes of `text` stand
    * in for real payloads; modality assigned round-robin by doc_id.
    */
  def fromDocuments(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("data"))

  /** STUB decoder (see class doc): deterministic dims from payload size.
    * Signature is the real contract: bytes in, (width, height, frames) out.
    */
  def decodeStub(mediaType: String, data: Array[Byte]): (Int, Int, Int) = {
    val n = data.length
    val width = 16 + n % 240
    val height = 16 + (n * 7) % 240
    val frames = if (mediaType == "video") 1 + n % 30 else 1
    (width, height, frames)
  }

  /** Decode/feature-extract pass: typed mapPartitions so a real decoder
    * is initialized once per partition and rows stream through it in
    * batches. No shuffle; metadata output is a narrow projection.
    */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[RawMedia].mapPartitions { it =>
      // real decoders allocate here, once per partition
      it.map { m =>
        val magic = m.data.take(4).map(b => f"${b & 0xff}%02X").mkString
        val (w, h, f) = decodeStub(m.media_type, m.data)
        MediaMeta(m.doc_id, m.media_type, m.data.length.toLong, magic, w, h, f)
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th frame index, the
    * shape a frame-extraction UDF emits (one row per sampled frame).
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF()
      .where(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Oracle mirroring fromDocuments+extractMeta+sampleFrames. */
  def framesOracleSql(table: String, stride: Int): String =
    s"""WITH meta AS (
       |  SELECT doc_id,
       |    CAST(CASE WHEN doc_id % 3 = 2
       |      THEN 1 + octet_length(encode(text)) % 30 ELSE 1 END AS INTEGER) AS n_frames
       |  FROM $table WHERE doc_id % 3 = 2)
       |SELECT doc_id, n_frames,
       |  CAST(unnest(range(0, n_frames, $stride)) AS INTEGER) AS frame_idx
       |FROM meta ORDER BY doc_id, frame_idx""".stripMargin

  /** Oracle mirroring fromDocuments+extractMeta arithmetically. */
  def oracleSql(table: String): String =
    s"""SELECT doc_id,
       |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
       |    WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  substr(hex(encode(text)), 1, 8) AS magic_hex,
       |  CAST(16 + octet_length(encode(text)) % 240 AS INTEGER) AS width,
       |  CAST(16 + (octet_length(encode(text)) * 7) % 240 AS INTEGER) AS height,
       |  CAST(CASE WHEN doc_id % 3 = 2
       |    THEN 1 + octet_length(encode(text)) % 30 ELSE 1 END AS INTEGER) AS n_frames
       |FROM $table ORDER BY doc_id""".stripMargin
}
