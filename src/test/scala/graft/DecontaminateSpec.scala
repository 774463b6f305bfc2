package graft

import graft.operators.text.Decontaminate
import org.scalatest.funsuite.AnyFunSuite

/** Benchmark decontamination: planted probes found exactly, whitespace
  * and case normalized away, hash candidates verified (no collision
  * flags), short probes refused.
  */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The capital of France is Paris, of course."),
    (2L, "Nothing to see here, entirely original prose."),
    (3L, "they asked: THE CAPITAL    of france IS paris — twice over: the capital of france is paris"),
    (4L, "answer to life the universe and everything"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("planted probes flag the containing docs, each probe once, others clean") {
    val probes = Seq(
      "the capital of France is Paris",  // docs 1 and 3 (3 contains it twice → still 1 hit)
      "answer to life the universe",     // doc 4
      "present in no document at all")
    val got = Decontaminate.flag(docs, probes).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got == Map(
      1L -> (1L, true), 2L -> (0L, false), 3L -> (1L, true),
      4L -> (1L, true), 5L -> (0L, false)))
  }

  test("normalization: case and whitespace runs in DOC text don't hide a probe") {
    // doc 3 spells the probe with a case change and a whitespace run
    val got = Decontaminate.flag(docs, Seq("the capital of france is paris"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got(3L))
  }

  test("duplicate probe strings count separately (distinct benchmark entries)") {
    val twice = Seq("the capital of france", "the capital of france")
    val got = Decontaminate.flag(docs, twice).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 2L && got(2L) == 0L)
  }

  test("probe list with nothing usable is refused loudly") {
    val e = intercept[IllegalArgumentException](
      Decontaminate.flag(docs, Seq("short", "  ", "tiny")))
    assert(e.getMessage.contains("probe"))
  }
}
