package graft

import graft.operators.text.LineDedup
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level line dedup (SURVEY §2 #35h): exact path semantics and
  * exact agreement of the hashed 100 TB path.
  */
class LineDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "INTRO\n\nalpha beta\nCOMMON FOOTER"),
    (2L, "INTRO\ngamma delta\nCOMMON FOOTER"),
    (3L, "INTRO\nCOMMON FOOTER"),
    (4L, "unique only\n\n\nmore unique"),
    (5L, "INTRO \nzeta")
  ).toDF("doc_id", "text")

  private def rows(df: DataFrame): Map[Long, (String, Int, Int)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap

  test("corpus-hot lines are removed everywhere, blanks and order survive") {
    val out = rows(LineDedup.run(docs))
    // INTRO (3x) and COMMON FOOTER (3x) are hot; blanks never count
    assert(out(1L) === (("\nalpha beta", 4, 2)))
    assert(out(2L) === (("gamma delta", 3, 2)))
    assert(out(4L) === (("unique only\n\n\nmore unique", 4, 0)))
  }

  test("a document of pure boilerplate empties but keeps its row") {
    val out = rows(LineDedup.run(docs))
    assert(out(3L) === (("", 2, 2)))
    assert(out.size === 5)
  }

  test("matching is verbatim: trailing whitespace makes a different line") {
    // "INTRO " (doc 5) occurs once — not hot, kept
    assert(rows(LineDedup.run(docs))(5L) === (("INTRO \nzeta", 2, 0)))
  }

  test("minCount above the max frequency is a lossless roundtrip") {
    val out = LineDedup.run(docs, minCount = 10)
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.collect().foreach { r =>
      assert(r.getString(1) === orig(r.getLong(0)))
      assert(r.getInt(3) === 0)
    }
  }

  test("hashed scale path agrees exactly with the string path") {
    // deterministic mixed corpus: shared boilerplate pool + unique lines
    // + repeated blanks, so the hot set, blank handling, and rebuild all
    // carry weight
    val pool = (0 until 8).map(i => s"boilerplate line number $i")
    val mixed = (0 until 200).map { id =>
      val ls = Seq(
        pool(id % 8),
        s"unique line $id",
        if (id % 5 == 0) "" else s"second unique $id",
        pool((id * 3) % 8))
      (id.toLong, ls.mkString("\n"))
    }.toDF("doc_id", "text")
    for (corpus <- Seq(docs, mixed); k <- Seq(2, 3)) {
      val exact = LineDedup.run(corpus, minCount = k).collect().toSeq
      val hashed = LineDedup.runHashed(corpus, minCount = k).collect().toSeq
      assert(hashed === exact)
    }
  }
}
