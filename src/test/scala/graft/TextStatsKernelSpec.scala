package graft

import graft.operators.text.{Curate, TextOps}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Exactness contract for [[graft.operators.text.TextStatsKernel]]:
  * the kernel-backed TokenCount/QualityScore/Curate must produce rows
  * IDENTICAL (including double bits and nulls) to their retained
  * Catalyst expression forms, on quirk fixtures and fuzz corpora.
  */
class TextStatsKernelSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(r =>
      (0 until r.length).map { i =>
        val v = if (r.isNullAt(i)) "NULL" else r.get(i)
        v match {
          case d: Double => java.lang.Double.doubleToLongBits(d).toString
          case other => other.toString
        }
      }.mkString("|")).toSeq

  private def toDf(docs: Seq[String]) =
    docs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("doc_id", "text")

  /** The Catalyst QualityScore/Curate references RAISE on empty
    * (post-normalization) text under ANSI — the edge the kernel
    * resolves to the oracle's NULL semantics (tested separately
    * below) — so the equality comparison excludes those docs.
    */
  private def checkAll(docs: Seq[String]): Unit = {
    val df = toDf(docs)
    assert(rowsOf(TextOps.TokenCount.run(df)) ===
      rowsOf(TextOps.TokenCount.exprRun(df)), "TokenCount diverged")
    val nonEmpty = toDf(docs.filter(_.nonEmpty))
    assert(rowsOf(TextOps.QualityScore.run(nonEmpty)) ===
      rowsOf(TextOps.QualityScore.exprRun(nonEmpty)), "QualityScore diverged")
    val nonBlank = toDf(docs.filter(_.exists(c => " \t\n\u000B\f\r".indexOf(c.toInt) < 0)))
    assert(rowsOf(Curate.run(nonBlank)) === rowsOf(Curate.exprRun(nonBlank)),
      "Curate diverged")
  }

  test("quirk fixtures: empties, pure whitespace, unicode, stopword case") {
    checkAll(Seq(
      "", " ", "\t\n\u000B\f\r", "x", ".", "...", "1 2 3",
      "the quick brown fox jumps over the lazy dog",
      "THE Quick BROWN a AN Of and TO in IS on FOR with",
      "zzz qqq xxx yyy", "a cat, a dog, and a fish!",
      "word with nbsp", "café résumé",
      "ΣΙΣΥΦΟΣ the end",
      "math 𝄞 symbol of beauty",
      "punct!!! ??? ###$$$ %%%", "mixed2words and 42 numbers 3.14",
      "  leading and trailing  ", "tab\tsep\nnewline\u000Bvtab",
      "a a a a a", "the the the the",
      ("the a of and to in is on for with " * 12).trim,
      ("lorem ipsum dolor sit amet " * 25).trim,
      "KK kelvin sign token", "İstanbul the city"))
  }

  test("fuzz: random token soup matches the expression forms") {
    val rng = new scala.util.Random(999331L)
    val pieces = Array(
      "the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with",
      "THE", "The", "tHe", "word", "spark", "zzz", "42", "3.14", "x1y",
      "!", "?", ".", ",", "#", "$", "%", "café", " ", "σ",
      "𝄞", "", "a-b", "a_b", "don't", "AN42Σ", "NΣ", "2Σ")
    val glue = Array(" ", "  ", "\t", "\n", "\u000B", "\f", "\r", "", " \n ")
    (1 to 400).foreach { _ =>
      val docs = (0 until 8).map { _ =>
        val sb = new StringBuilder
        (1 to rng.nextInt(20)).foreach { _ =>
          sb.append(pieces(rng.nextInt(pieces.length)))
          sb.append(glue(rng.nextInt(glue.length)))
        }
        sb.toString
      }
      // force exact-duplicate groups so Curate's window leg is exercised
      checkAll(docs ++ docs.take(2).map(d => " " + d.toUpperCase + " "))
    }
  }

  test("empty text: expression reference raises under ANSI; kernel matches the ORACLE") {
    // the latent pre-kernel crash: punct/length divides by zero
    val empty = toDf(Seq(""))
    intercept[Exception] { TextOps.QualityScore.exprRun(empty).collect() }
    // kernel: DuckDB-oracle semantics — NULL punct_ratio, the score's
    // punctuation term contributes 0 (least(1.0, NULL) = 1.0 there)
    val r = TextOps.QualityScore.run(empty).collect().head
    assert(r.isNullAt(r.fieldIndex("punct_ratio")))
    assert(r.getAs[Int]("n_tokens") === 1)
    assert(r.getAs[Double]("quality_score") === 0.004) // 0.4 * 1/100
    // Curate on a whitespace-only doc (normalizes to ""): low_quality
    val c = Curate.run(toDf(Seq(" \t "))).collect().head
    assert(c.getAs[Double]("quality_score") === 0.004)
    assert(c.getAs[String]("drop_reason") === "low_quality")
  }

  test("null text rows: kernel mirrors the expression nulls") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, "w x y z"),
        org.apache.spark.sql.Row(2L, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    assert(rowsOf(TextOps.TokenCount.run(df)) ===
      rowsOf(TextOps.TokenCount.exprRun(df)))
    assert(rowsOf(TextOps.QualityScore.run(df)) ===
      rowsOf(TextOps.QualityScore.exprRun(df)))
    assert(rowsOf(Curate.run(df)) === rowsOf(Curate.exprRun(df)))
  }
}
