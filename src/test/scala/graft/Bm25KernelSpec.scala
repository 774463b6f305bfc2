package graft

import graft.operators.text.{Bm25Kernel, KeywordSearch}
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[KeywordSearch.bm25]] (the [[Bm25Kernel]] execution path) to
  * [[KeywordSearch.exprBm25]], the retained Catalyst reference — the
  * same adopted-kernel contract as PiiKernelSpec/HtmlKernelSpec/
  * TextStatsKernelSpec: the expression form stays the single source of
  * semantics (and the DuckDB oracle's mirror); the kernel must agree
  * row-for-row, including the `'' → ['']` dl convention, ICU
  * lowercasing, the explicit whitespace class (U+000B IS whitespace on
  * both paths), null documents, zero-df terms, and rank/tie/cut
  * behavior.
  */
class Bm25KernelSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def run(corpus: Seq[(Long, String)], queries: Seq[(Int, String)],
                  k: Int): (Seq[(Int, Long, Double, Int)], Seq[(Int, Long, Double, Int)]) = {
    val docs = corpus.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted
    (rows(KeywordSearch.bm25(docs, queries, k)),
      rows(KeywordSearch.exprBm25(docs, queries, k)))
  }

  test("kernel == expression on a hand-built corpus with every edge") {
    val corpus = Seq(
      (1L, "spark spark merge the window"),
      (2L, "spark\u000Bwindow\ttab"),          // U+000B and tab are token breaks
      (3L, ""),                                 // dl = 1 (the [''] convention)
      (4L, "   \t\n  "),                        // ws-only: dl = 1
      (5L, null.asInstanceOf[String]),          // counted in N, never scored
      (6L, "AN42Σ spark"),                 // ICU Final_Sigma lowering
      (7L, "İstanbul wındow SPARK"),  // dotted/dotless I
      (8L, "merge merge merge merge merge"),
      (9L, "ſpark spark"))                      // long s must NOT fold to 's'
    val queries = Seq(0 -> "SPARK window", 1 -> "merge zzz-unseen",
      2 -> "an42σ", 3 -> "nothing matches here")
    val (kernel, expr) = run(corpus, queries, k = 5)
    assert(kernel.nonEmpty)
    assert(kernel === expr)
  }

  test("fuzz: kernel == expression on randomized multilingual corpora") {
    val rnd = new scala.util.Random(0xB425L)
    val vocab = Array("spark", "window", "merge", "sort", "the", "a",
      "Σοφός", "straße", "Iİı",
      "an42Σ", "x", "kül", "中文", "12-34")
    val wsPool = Array(" ", "\t", "\n", "\u000B", "\f", "\r", "  ", " \u000B ")
    def doc(): String = {
      val n = rnd.nextInt(12)
      val sb = new StringBuilder
      if (rnd.nextInt(4) == 0) sb.append(wsPool(rnd.nextInt(wsPool.length)))
      (0 until n).foreach { _ =>
        sb.append(vocab(rnd.nextInt(vocab.length)))
        sb.append(wsPool(rnd.nextInt(wsPool.length)))
      }
      sb.toString
    }
    (0 until 8).foreach { round =>
      val corpus = (0L until 40L).map { id =>
        val t = rnd.nextInt(20) match {
          case 0 => null.asInstanceOf[String]
          case 1 => ""
          case _ => doc()
        }
        (id, t)
      }
      val queries = (0 until 3).map { qid =>
        qid -> (0 until (1 + rnd.nextInt(3)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val (kernel, expr) = run(corpus, queries, k = 1 + rnd.nextInt(6))
      assert(kernel === expr, s"fuzz round $round diverged")
    }
  }

  test("docScan: dl convention and term frequencies") {
    val ts = new Bm25Kernel.TermSet(Array("spark", "a"))
    val tf = new Array[Int](2)
    assert(Bm25Kernel.docScan("spark a spark  b", ts, tf) === 4)
    assert(tf.toSeq === Seq(2, 1))
    assert(Bm25Kernel.docScan("", ts, tf) === 1)
    assert(tf.toSeq === Seq(0, 0))
    assert(Bm25Kernel.docScan(" \u000B\t ", ts, tf) === 1)
    assert(tf.toSeq === Seq(0, 0))
    // prefixes / suffixes are not matches
    assert(Bm25Kernel.docScan("sparks spar aa", ts, tf) === 3)
    assert(tf.toSeq === Seq(0, 0))
  }

  test("TermSet: length-bucketed exact match, empty set matches nothing") {
    val ts = new Bm25Kernel.TermSet(Array("ab", "cd", "abc"))
    assert(ts.matchToken("xabcy", 1, 3) === 0)
    assert(ts.matchToken("xcd", 1, 3) === 1)
    assert(ts.matchToken("abc", 0, 3) === 2)
    assert(ts.matchToken("abcd", 0, 4) === -1)
    val empty = new Bm25Kernel.TermSet(Array.empty)
    assert(empty.matchToken("a", 0, 1) === -1)
  }

  test("kernel plan has no exchange before the top-k window") {
    val docs = (0L until 50L).map(i => (i, s"spark doc $i window")).toDF("doc_id", "text")
    val out = KeywordSearch.bm25(docs, Seq(0 -> "spark window"), k = 5)
    val plan = out.queryExecution.executedPlan.toString
    // exactly one Exchange family: the single-query-key window (plus
    // the final orderBy range partitioning) — no per-hit hash exchange
    // from a groupBy aggregate as in the expression form
    assert(!plan.contains("HashAggregate"),
      s"kernel path must not aggregate per hit:\n$plan")
  }
}
