package graft

import graft.operators.text.SpanDedup
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-level exact-substring dedup (SURVEY §2 #35i): exact-path
  * semantics of the ExactSubstr rule (Lee et al. 2022) and exact
  * agreement of the hashed 100 TB path.
  */
class SpanDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // w=4 windows; "the quick brown fox jumps" is a shared 5-token span
  // (docs 1+2) → 2 hot windows that overlap-merge into 5 covered tokens
  private val docs = Seq(
    (1L, "the quick brown fox jumps over a lazy dog"),
    (2L, "intro words the quick brown fox jumps tail"),
    (3L, "repeat me now ok repeat me now ok"),
    (4L, "all tokens here are one of a kind"),
    (5L, "tiny doc")
  ).toDF("doc_id", "text")

  private def rows(df: DataFrame): Map[Long, (String, Int, Int)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap

  test("a cross-document span is removed from every document, coverage merges overlaps") {
    val out = rows(SpanDedup.run(docs, w = 4))
    // docs 1+2 share the 5-token span → windows [the..fox] and
    // [quick..jumps] are both hot; union covers exactly those 5 tokens
    assert(out(1L) === (("over a lazy dog", 9, 5)))
    assert(out(2L) === (("intro words tail", 8, 5)))
  }

  test("a span repeated WITHIN one document is duplicated evidence too") {
    // doc 3: "repeat me now ok" occurs twice → whole doc is covered
    val out = rows(SpanDedup.run(docs, w = 4))
    assert(out(3L) === (("", 8, 8)))
    assert(out.size === 5)
  }

  test("unique docs and docs shorter than w survive verbatim") {
    val out = rows(SpanDedup.run(docs, w = 4))
    assert(out(4L) === (("all tokens here are one of a kind", 8, 0)))
    assert(out(5L) === (("tiny doc", 2, 0)))
  }

  test("minCount above the max frequency is a lossless roundtrip") {
    val out = SpanDedup.run(docs, w = 4, minCount = 10)
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.collect().foreach { r =>
      assert(r.getString(1) === orig(r.getLong(0)))
      assert(r.getInt(3) === 0)
    }
  }

  test("hashed scale path agrees exactly with the string path") {
    // deterministic mixed corpus: a shared boilerplate sentence in a
    // third of docs, a second one in a fifth (both on the same doc for
    // multiples of 15 → straddle windows), unique filler elsewhere
    val b1 = "this content is provided as is without any warranty"
    val b2 = "subscribe now for unlimited access to premium articles"
    val mixed = (0 until 150).map { id =>
      val base = (0 until 6).map(j => s"w${(id * 7 + j * 3) % 97}").mkString(" ")
      val parts = Seq(base) ++
        (if (id % 3 == 0) Seq(b1) else Nil) ++
        (if (id % 5 == 0) Seq(b2) else Nil)
      (id.toLong, parts.mkString(" "))
    }.toDF("doc_id", "text")
    val withNull = mixed.unionAll(
      Seq((9999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    for (corpus <- Seq(docs, mixed, withNull); k <- Seq(2, 3); w <- Seq(4, 6)) {
      val exact = SpanDedup.run(corpus, w = w, minCount = k).collect().toSeq
      val hashed = SpanDedup.runHashed(corpus, w = w, minCount = k).collect().toSeq
      assert(hashed === exact, s"w=$w minCount=$k")
    }
  }

  test("kernel: rolling window hash equals the direct per-window polynomial") {
    import graft.operators.text.SpanDedupKernel
    val text = "a bb ccc a bb ccc dddd e f g a bb ccc"
    val w = 3
    val rolled = SpanDedupKernel.windowHashes(text, w)
    val toks = text.split(" ", -1)
    assert(rolled.length === toks.length - w + 1)
    // each window's rolled hash must equal hashing that window alone
    // (the polynomial depends only on the w token hashes)
    rolled.zipWithIndex.foreach { case (h, i) =>
      val alone = SpanDedupKernel.windowHashes(
        toks.slice(i, i + w).mkString(" "), w)
      assert(alone.length === 1 && alone.head === h, s"window $i")
    }
    // equal token windows collide by design, shifted ones do not
    assert(rolled(0) === rolled(3) && rolled(0) === rolled(10))
    assert(rolled(0) !== rolled(1))
    // short and empty docs produce no windows ('' is ONE empty token)
    assert(SpanDedupKernel.windowHashes("a b", w).isEmpty)
    assert(SpanDedupKernel.windowHashes("", 2).isEmpty)
    assert(SpanDedupKernel.windowHashes("", 1).length === 1)
  }

  test("kernel: rebuild covers, joins with single spaces, preserves empty tokens") {
    import graft.operators.text.SpanDedupKernel
    assert(SpanDedupKernel.rebuild("a b c d e", 2, Seq.empty) === (("a b c d e", 5, 0)))
    assert(SpanDedupKernel.rebuild("a b c d e", 2, Seq(1, 2)) === (("a e", 5, 3)))
    assert(SpanDedupKernel.rebuild("a b", 2, Seq(0)) === (("", 2, 2)))
    // double space = empty token in the single-space convention
    assert(SpanDedupKernel.rebuild("a  b c", 2, Seq(2)) === (("a ", 4, 2)))
  }

  test("int doc_id: hashed path returns the input's id type, like the exact path") {
    // advice-r14: the kernel works on longs, so without the output
    // cast an int-id frame came back LongType from runHashed but
    // IntegerType from run() — schema drift that silently broke the
    // pinned hashed ≡ exact equality for exactly the integral types
    // requireIntegralId admits
    import spark.implicits._
    val phrase = (1 to 6).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1, s"$phrase unique one"), (2, s"$phrase unique two"), (3, "short doc"))
      .toDF("doc_id", "text")
    val exact = SpanDedup.run(docs, w = 4)
    val hashed = SpanDedup.runHashed(docs, w = 4)
    assert(hashed.schema("doc_id").dataType === exact.schema("doc_id").dataType)
    assert(hashed.collect().toSeq === exact.collect().toSeq)
  }
}
