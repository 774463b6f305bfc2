package graft

import graft.operators.multimodal.BinaryPipeline
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing (SURVEY §2 #36). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val media =
    BinaryPipeline.fromDocuments(Tables(spark, TestSpark.sf0001, "documents"))

  test("payload bytes round-trip: binary column carries exact UTF-8 of text") {
    val doc = Tables(spark, TestSpark.sf0001, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    media.select("doc_id", "data").collect().take(50).foreach { r =>
      assert(new String(r.getAs[Array[Byte]]("data"), "UTF-8") == doc(r.getLong(0)))
    }
  }

  test("extractMeta: schema, dims from stub decoder, magic bytes, modality split") {
    val meta = BinaryPipeline.extractMeta(spark, media)
    assert(meta.columns.toSeq ==
      Seq("doc_id", "media_type", "n_bytes", "magic_hex", "width", "height", "n_frames"))
    val rows = meta.collect()
    assert(rows.length == 500)
    rows.foreach { m =>
      val (w, h, f) = BinaryPipeline.decodeStub(m.media_type,
        Array.fill(m.n_bytes.toInt)(0.toByte))
      assert(m.width == w && m.height == h && m.n_frames == f)
      assert(m.magic_hex.length == 8)
      if (m.media_type != "video") assert(m.n_frames == 1)
      assert(m.media_type == Seq("image", "audio", "video")((m.doc_id % 3).toInt))
    }
  }

  test("sampleFrames explodes only video rows, stride respected") {
    val meta = BinaryPipeline.extractMeta(spark, media)
    val frames = BinaryPipeline.sampleFrames(meta, stride = 4).collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val n = rs.head.getAs[Int]("n_frames")
      val idxs = rs.map(_.getAs[Int]("frame_idx")).sorted.toSeq
      assert(idxs == (0 until n by 4).toSeq)
    }
    val videoIds = meta.where(col("media_type") === "video")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.getLong(0)).toSet == videoIds)
  }
}
