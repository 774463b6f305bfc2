package graft

import graft.operators.text.Chunker
import org.scalatest.funsuite.AnyFunSuite

/** Sliding-window chunking (SURVEY §2 #35l): the chunk-count formula,
  * coverage/overlap invariants, boundary cases, and the roundtrip
  * property that concatenating the non-overlapped prefixes rebuilds the
  * document.
  */
class ChunkerSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def doc(n: Int): String = (0 until n).map(i => s"w$i").mkString(" ")

  private def chunks(text: String, window: Int, stride: Int): Seq[(Int, Int, Int, String)] =
    Chunker.run(Seq((1L, text)).toDF("doc_id", "text"), window, stride)
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toSeq

  test("short document yields exactly one whole-document chunk") {
    val out = chunks(doc(5), window = 8, stride = 4)
    assert(out === Seq((0, 0, 5, doc(5))))
    // n == window is still one chunk
    assert(chunks(doc(8), 8, 4).map(_._1) === Seq(0))
  }

  test("chunk count follows ceil((n - window) / stride) + 1") {
    // n=10, w=8, s=4 → ceil(2/4)+1 = 2 chunks; last chunk is short
    val out = chunks(doc(10), 8, 4)
    assert(out.map(c => (c._1, c._2, c._3)) === Seq((0, 0, 8), (1, 4, 6)))
    // n=16, w=8, s=4 → ceil(8/4)+1 = 3; last chunk exactly fills
    assert(chunks(doc(16), 8, 4).map(c => (c._2, c._3)) ===
      Seq((0, 8), (4, 8), (8, 8)))
    // n=17 → ceil(9/4)+1 = 4; final start 12 < n, never an empty chunk
    assert(chunks(doc(17), 8, 4).map(c => (c._2, c._3)) ===
      Seq((0, 8), (4, 8), (8, 8), (12, 5)))
  }

  test("consecutive chunks overlap by window - stride and cover every token") {
    val n = 53
    val out = chunks(doc(n), window = 16, stride = 10)
    out.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._2 === a._2 + 10)
        assert(a._2 + a._3 >= b._2) // no gap
      case _ =>
    }
    assert(out.head._2 === 0)
    assert(out.last._2 + out.last._3 === n) // last chunk ends at n
    // chunk text is exactly the token slice it claims
    val toks = doc(n).split(" ")
    out.foreach { c =>
      assert(c._4 === toks.slice(c._2, c._2 + c._3).mkString(" "))
    }
  }

  test("stride == window is exact partitioning (zero overlap, full cover)") {
    val out = chunks(doc(20), 8, 8)
    assert(out.map(c => (c._2, c._3)) === Seq((0, 8), (8, 8), (16, 4)))
    assert(out.map(_._4).mkString(" ") === doc(20))
  }

  test("multi-doc frame keeps per-doc chunk ids and ignores layout") {
    val df = Seq(
      (1L, doc(4)), (2L, doc(30)), (3L, doc(9))
    ).toDF("doc_id", "text").repartition(7)
    val out = Chunker.run(df, 8, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(3)))
    assert(out.count(_._1 == 1L) === 1)
    // n=30, w=8, s=4 → ceil(22/4)+1 = 7 chunks
    assert(out.count(_._1 == 2L) === 7)
    assert(out.count(_._1 == 3L) === 2)
  }

  test("invalid window/stride are refused loudly") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Chunker.run(df, 8, 9))
    intercept[IllegalArgumentException](Chunker.run(df, 0, 1))
    intercept[IllegalArgumentException](Chunker.run(df, 8, 0))
  }
}
