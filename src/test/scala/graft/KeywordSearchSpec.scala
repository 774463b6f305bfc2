package graft

import graft.operators.text.KeywordSearch
import org.scalatest.funsuite.AnyFunSuite

/** BM25 keyword search (SURVEY §2 #39): scores against a from-first-
  * principles Scala implementation, ranking/tie/cut semantics, and the
  * scale-shape guarantees.
  */
class KeywordSearchSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark merge"),
    (2L, "spark window"),
    (3L, "merge sort table"),
    (4L, "window window window spark"),
    (5L, "sort sort sort sort")
  )
  private val docs = corpus.toDF("doc_id", "text")

  /** Independent reference: plain-Scala BM25 over the same tokens. */
  private def reference(queries: Seq[(Int, String)], k1: Double = 1.2,
                        b: Double = 0.75): Map[(Int, Long), Double] = {
    val toks = corpus.map { case (id, t) => id -> t.toLowerCase.split(" ").toSeq }
    val n = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val pairs = for {
      (qid, qtext) <- queries
      term <- qtext.toLowerCase.split(" ").filter(_.nonEmpty).distinct
      df = toks.count(_._2.contains(term)) if df > 0
      idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
      (docId, dtoks) <- toks
      tf = dtoks.count(_ == term) if tf > 0
    } yield (qid, docId) ->
      idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dtoks.size / avgdl))
    pairs.groupBy(_._1).map { case (key, vs) => key -> vs.map(_._2).sum }
  }

  test("scores match a from-first-principles BM25 at 4dp") {
    val queries = Seq(0 -> "spark window", 1 -> "sort merge")
    val got = KeywordSearch.bm25(docs, queries, k = 10).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = reference(queries).map { case (key, s) =>
      key -> BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got === want)
  }

  test("rank is unique: score desc, doc_id tie-break; k cuts per query") {
    // docs 2 and a clone score identically for "window" when lengths
    // match — doc_id inside the rank ORDER BY makes ranks unique (the
    // documented engine-portable tie-break, mirrored by the oracle), so
    // the tied pair lands at ranks 2 and 3 in doc_id order and
    // `rank <= k` always returns exactly min(k, matches) rows
    val withClone = (corpus :+ (6L, "spark window")).toDF("doc_id", "text")
    val out = KeywordSearch.bm25(withClone, Seq(0 -> "window"), k = 3).collect()
    assert(out.length === 3)
    assert(out.map(r => (r.getLong(1), r.getInt(3))).toSeq ===
      Seq((4L, 1), (2L, 2), (6L, 3)))
    assert(out(1).getDouble(2) === out(2).getDouble(2))
  }

  test("unseen terms contribute nothing; an all-unseen query returns no rows") {
    val base = KeywordSearch.bm25(docs, Seq(0 -> "spark"), k = 10).collect()
    val padded = KeywordSearch.bm25(docs, Seq(0 -> "spark zzzz"), k = 10).collect()
    assert(padded.map(r => (r.getLong(1), r.getDouble(2))).toSeq ===
      base.map(r => (r.getLong(1), r.getDouble(2))).toSeq)
    assert(KeywordSearch.bm25(docs, Seq(0 -> "zzzz qqqq"), k = 10).count() === 0)
  }

  test("matching is case-insensitive on both sides") {
    val lower = KeywordSearch.bm25(docs, Seq(0 -> "spark window"), k = 10).collect()
    val upper = KeywordSearch.bm25(docs, Seq(0 -> "SPARK Window"), k = 10).collect()
    assert(upper === lower)
  }

  test("search() is the one-query convenience") {
    val out = KeywordSearch.search(docs, "merge", k = 2).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(out.head.schema.fieldNames.toSeq === Seq("doc_id", "score", "rank"))
  }

  test("int doc_id: kernel path returns the input's id type, like exprBm25") {
    // advice-r14: the kernel casts ids to long internally; the output
    // must come back in the input column's type so the fuzz-pinned
    // kernel ≡ expression equality holds for int/short id frames too
    val intDocs = corpus.map { case (id, t) => (id.toInt, t) }.toDF("doc_id", "text")
    val q = Seq(0 -> "spark merge")
    val kernel = KeywordSearch.bm25(intDocs, q, k = 5)
    val expr = KeywordSearch.exprBm25(intDocs, q, k = 5)
    assert(kernel.schema("doc_id").dataType === expr.schema("doc_id").dataType)
    assert(kernel.collect().toSeq === expr.collect().toSeq)
  }
}
