package graft

import graft.operators.text.Perplexity
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Corpus bigram-LM perplexity (SURVEY §2 #35j): hand-computed model
  * probabilities on a tiny corpus, edge semantics, and exact agreement
  * of the hashed 100 TB path with the string path.
  */
class PerplexitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // corpus: V = {a,b,c} (3), bigrams: (a,b)x2 from docs 1+2, (b,a)x1,
  // (a,c)x1; c1(a)=3, c1(b)=1
  private val docs = Seq(
    (1L, "a b a c"),
    (2L, "a b"),
    (3L, "c"),
    (4L, "")
  ).toDF("doc_id", "text")

  private def byId(df: DataFrame): Map[Long, Row] =
    df.collect().map(r => r.getLong(0) -> r).toMap

  test("scores match the hand-computed Laplace bigram model") {
    val out = byId(Perplexity.run(docs))
    // doc 1 bigrams: (a,b) p=(2+1)/(3+3)=1/2; (b,a) p=(1+1)/(1+3)=1/2;
    // (a,c) p=(1+1)/(3+3)=1/3
    val xent1 = -(math.log(0.5) + math.log(0.5) + math.log(1.0 / 3)) / 3
    assert(out(1L).getLong(1) === 3)
    assert(out(1L).getDouble(2) === math.rint(xent1 * 1000) / 1000)
    assert(out(1L).getDouble(3) === math.rint(math.exp(xent1) * 100) / 100)
    // doc 2: single bigram (a,b) → xent = ln 2
    assert(out(2L).getLong(1) === 1)
    assert(out(2L).getDouble(2) === math.rint(math.log(2) * 1000) / 1000)
  }

  test("documents with fewer than two tokens get null scores, not dropped") {
    val out = byId(Perplexity.run(docs))
    assert(out.size === 4)
    for (id <- Seq(3L, 4L)) {
      assert(out(id).getLong(1) === 0)
      assert(out(id).isNullAt(2) && out(id).isNullAt(3))
    }
  }

  test("tokenization drops empty tokens from repeated spaces") {
    val messy = Seq((1L, "a  b"), (2L, " a b ")).toDF("doc_id", "text")
    val out = byId(Perplexity.run(messy))
    // both docs reduce to the single bigram (a,b): identical scores
    assert(out(1L).getLong(1) === 1)
    assert(out(1L).getDouble(2) === out(2L).getDouble(2))
  }

  test("smoothing sums to one over the vocabulary") {
    // given first token a: sum over {a,b,c} of (c(a,w)+1)/(c1(a)+V)
    // = (0+1 + 2+1 + 1+1) / (3+3) = 1 — the model is a distribution,
    // asserted here against the same counts the operator computes
    val bi = Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L)
    val c1a = bi.collect { case ((a, _), c) if a == "a" => c }.sum
    val v = 3
    val mass = Seq("a", "b", "c")
      .map(w2 => (bi.getOrElse(("a", w2), 0L) + 1).toDouble / (c1a + v)).sum
    assert(math.abs(mass - 1.0) < 1e-12)
  }

  test("cross-corpus: unseen bigrams take the smoothed left-join mass") {
    // model: "a b" ×2 → V={a,b}=2, c(a,b)=2, c1(a)=2
    // target doc 10: "a b" seen → p=(2+1)/(2+2)=3/4
    // target doc 11: "b a" — bigram AND first-token b unseen →
    //   p=(0+1)/(0+2)=1/2; "a z": first a seen, pair unseen →
    //   p=(0+1)/(2+2)=1/4
    val model = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    val target = Seq((10L, "a b"), (11L, "b a z")).toDF("doc_id", "text")
    val out = byId(Perplexity.runCross(model, target))
    assert(out(10L).getDouble(2) ===
      math.rint(-math.log(0.75) * 1000) / 1000)
    val xent11 = -(math.log(0.5) + math.log(0.25)) / 2
    assert(out(11L).getLong(1) === 2)
    assert(out(11L).getDouble(2) === math.rint(xent11 * 1000) / 1000)
    // hashed cross path agrees exactly
    assert(Perplexity.runCrossHashed(model, target).collect().toSeq ===
      Perplexity.runCross(model, target).collect().toSeq)
  }

  test("self-trained run is exactly runCross with itself") {
    assert(Perplexity.run(docs).collect().toSeq ===
      Perplexity.runCross(docs, docs).collect().toSeq)
  }

  test("hashed scale path agrees exactly with the string path") {
    val vocab = Vector("spark", "join", "window", "merge", "scan", "batch",
      "row", "filter", "agg", "sort")
    val mixed = (0 until 300).map { id =>
      val n = 2 + (id * 7) % 40
      val ws = (0 until n).map(i => vocab((id * 31 + i * i * 13) % vocab.size))
      (id.toLong, ws.mkString(" "))
    }.toDF("doc_id", "text")
    val exact = Perplexity.run(mixed).collect().toSeq
    val hashed = Perplexity.runHashed(mixed).collect().toSeq
    assert(exact === hashed)
  }
}
