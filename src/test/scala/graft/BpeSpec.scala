package graft

import graft.operators.text.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer (SURVEY §2 #34b): hand-computed merge sequence,
  * greedy-application semantics, roundtrip, monotonicity, and the
  * distributed word-count + map-side apply path.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("learn follows the hand-computed greedy merge sequence") {
    // words (with </w> on the last char):  abab = [a b a b</w>] ×2,
    // abc = [a b c</w>] ×1
    // pass 1: (a,b)=3, (b,a)=2, (a,b</w>)=2, (b,c</w>)=1 → merge (a,b)
    // pass 2: [ab a b</w>] [ab c</w>] → (ab,a)=2, (a,b</w>)=2,
    //         (ab,c</w>)=1 → tie 2=2 breaks lexicographically:
    //         ("a","b</w>") < ("ab","a") → merge (a, b</w>)
    // pass 3: [ab ab</w>] [ab c</w>] → (ab,ab</w>)=2 → merge
    // pass 4: nothing reaches minPairCount=2 → stop early
    val wf = Seq("abab" -> 2L, "abc" -> 1L)
    assert(Bpe.learn(wf, numMerges = 10) ===
      Seq(("a", "b"), ("a", "b</w>"), ("ab", "ab</w>")))
  }

  test("encodeWord applies merges greedily by rank; unseen words degrade to chars") {
    val ranks = Bpe.learn(Seq("abab" -> 2L, "abc" -> 1L), 10).zipWithIndex.toMap
    assert(Bpe.encodeWord("abab", ranks) === Vector("abab</w>"))
    assert(Bpe.encodeWord("abc", ranks) === Vector("ab", "c</w>"))
    assert(Bpe.encodeWord("ba", ranks) === Vector("b", "a</w>"))
    assert(Bpe.encodeWord("ababab", ranks) === Vector("ab", "abab</w>"))
    assert(Bpe.encodeWord("zzz", ranks) === Vector("z", "z", "z</w>"))
  }

  test("tokens always concatenate back to the word (+ end marker)") {
    val corpus = Seq("the quick brown fox", "the the the lazy dog",
      "quick quick brown")
    val wf = corpus.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }.toSeq
    val ranks = Bpe.learn(wf, 20, minPairCount = 1).zipWithIndex.toMap
    (corpus.flatMap(_.split(" ")) :+ "unseen").foreach { w =>
      assert(Bpe.encodeWord(w, ranks).mkString === w + "</w>", s"word $w")
    }
  }

  test("token counts decrease monotonically with more merges") {
    val docs = Seq((0L, "spark merge join join merge spark spark"),
      (1L, "window window batch stream")).toDF("doc_id", "text")
    val counts = Seq(0, 2, 5, 20).map { m =>
      val merges = Bpe.learnFromCorpus(docs, m, minPairCount = 1)
      Bpe.tokenStats(docs, merges).collect().map(_.getInt(2)).sum
    }
    assert(counts === counts.sorted.reverse)
    // 0 merges → every word is its character count
    val charTokens = docs.collect().map(_.getString(1).split(" ")
      .filter(_.nonEmpty).map(_.length).sum).sum
    assert(counts.head === charTokens)
  }

  test("distributed apply agrees with a driver-side re-encode") {
    val docs = (0 until 120).map { i =>
      (i.toLong, Seq("alpha", "beta", "gamma", "delta")
        .take(1 + i % 4).mkString(" ") * (1 + i % 3))
    }.toDF("doc_id", "text")
    val merges = Bpe.learnFromCorpus(docs, 25, minPairCount = 1)
    val ranks = merges.zipWithIndex.toMap
    val got = Bpe.tokenStats(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    docs.collect().foreach { r =>
      val ws = r.getString(1).split(" ").filter(_.nonEmpty)
      val want = (ws.length, ws.map(w => Bpe.encodeWord(w, ranks).length).sum)
      assert(got(r.getLong(0)) === want, s"doc ${r.getLong(0)}")
    }
  }

  test("empty documents keep their row with zero counts") {
    val docs = Seq((0L, ""), (1L, "one")).toDF("doc_id", "text")
    val out = Bpe.tokenStats(docs, Nil).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(0L) === ((0, 0)))
    assert(out(1L) === ((1, 3)))
  }
}
