package graft

import graft.operators.dedup.Dedup
import graft.operators.dedup.Dedup.{MinHashDedup, SimHash, EmbeddingDedup}
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus behavior of the hot-bucket bound (SURVEY §2
  * #26/#27/#29 scale paths): a corpus of c identical documents (or
  * empty documents) must enter the band/chunk/bucket self-join as ONE
  * representative, not c rows — otherwise the join OUTPUT blows up to
  * C(c,2) before any filter can run, which AQE cannot split. Pair
  * OUTPUT is still quadratic in a duplicate class (that is the
  * contract), but it is produced by member expansion, never by the
  * join.
  */
class DedupDegenerateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val C = 1000
  private def nPairs(n: Int): Long = n.toLong * (n - 1) / 2

  /** C identical docs (ids 0..C-1) + C empty docs (ids C..2C-1). */
  private lazy val degenerate = {
    val text = (0 until 30).map(i => s"tok$i").mkString(" ")
    ((0 until C).map(i => (i.toLong, text)) ++
      (C until 2 * C).map(i => (i.toLong, ""))).toDF("doc_id", "text")
  }

  test("minhash banding sees ONE rep for a 1k-identical + 1k-empty corpus") {
    val sigs = MinHashDedup.signatures(degenerate)
    val members = MinHashDedup.contentMembers(sigs)
    // 2 content groups: the identical class and the empty class
    assert(members.select("rep").distinct().count() == 2)
    // only the non-empty rep enters banding: Bands rows TOTAL, not
    // O(C × Bands) — this is the O(n) band-join input bound
    val banded = MinHashDedup.bandedReps(sigs, members,
      MinHashDedup.DefaultMaxBucket)
    assert(banded.count() == MinHashDedup.Bands)
  }

  test("minhash nearDuplicates: C(c,2) pairs at 1.0 from expansion, empties emit nothing") {
    val pairs = MinHashDedup.nearDuplicates(degenerate, 0.8)
    assert(pairs.count() == nPairs(C))
    // all pairs are within the identical class at jaccard exactly 1.0
    val sample = pairs.limit(50).collect()
    sample.foreach { r =>
      assert(r.getLong(0) < C && r.getLong(1) < C)
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("clusterEdges: LINEAR in clone count (a star), same components as the pair expansion") {
    // the 1k-identical class yields exactly C−1 star edges — not the
    // C(C,2) ≈ 500k pairs the expansion contract emits — and the empty
    // class yields nothing
    val edges = MinHashDedup.clusterEdges(degenerate, 0.8)
    assert(edges.count() == (C - 1).toLong)
    // the components built from the star equal the components built
    // from the full quadratic pair list
    val viaStar = Dedup.Components.components(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPairs = Dedup.Components.components(
        MinHashDedup.nearDuplicates(degenerate, 0.8)
          .select("doc_id_1", "doc_id_2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == viaPairs)
    assert(viaStar.values.toSet == Set(0L)) // one cluster, min-id keyed
  }

  test("candidatePairs: identical class expands in-group, empty class is excluded") {
    val sigs = MinHashDedup.signatures(degenerate)
    assert(MinHashDedup.candidatePairs(sigs).count() == nPairs(C))
    // empties alone produce NOTHING (previously C(c,2) candidates that
    // verification had to reject one by one)
    val emptyOnly = (0 until C).map(i => (i.toLong, "")).toDF("doc_id", "text")
    assert(MinHashDedup.candidatePairs(
      MinHashDedup.signatures(emptyOnly)).count() == 0)
  }

  test("simhash: identical and empty classes pair in-group at hamming 0, join input is reps only") {
    val pairs = SimHash.hammingPairs(degenerate, maxHamming = 3)
    // identical texts AND identical (empty) texts both have identical
    // simhash signatures — hamming is a pure signature distance, so
    // both classes legitimately pair at distance 0
    assert(pairs.count() == 2 * nPairs(C))
    assert(pairs.where("hamming != 0").count() == 0)
  }

  test("embedding LSH: identical vectors expand in-group, zero vectors emit nothing") {
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val vecs = ((0 until C).map(i => (i.toLong, v)) ++
      (C until 2 * C).map(i => (i.toLong, Array.fill(8)(0.0f))))
      .toDF("vec_id", "embedding")
    val pairs = EmbeddingDedup.lshPairs(vecs, 0.8, dim = 8, bits = 4, tables = 4)
    // identical non-zero vectors: cosine(v, v) = 1.0 through the same
    // expression as the cross path; zero vectors: 0/0 → no pair
    assert(pairs.count() == nPairs(C))
    val sample = pairs.limit(50).collect()
    sample.foreach { r =>
      assert(r.getLong(0) < C && r.getLong(1) < C)
      assert(r.getDouble(2) == 1.0)
    }
  }

  /** 12 docs sharing a 30-token base, each with a different token
    * swapped — pairwise jaccard high (~0.8-0.9) but every gram set
    * DISTINCT, so the collapse cannot merge them and band buckets
    * genuinely exceed a small cap.
    */
  private lazy val nearIdentical = {
    val base = (0 until 30).map(i => s"word${i}xx")
    (0 until 12).map { d =>
      (d.toLong, base.updated(d, s"swap$d").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("heavyBuckets reports buckets over the cap; capped run loses recall only") {
    val heavy = Dedup.MinHashDedup.heavyBuckets(nearIdentical, maxBucket = 4)
      .collect()
    assert(heavy.nonEmpty, "expected at least one band bucket with >4 distinct contents")
    heavy.foreach(r => assert(r.getAs[Long]("n_reps") > 4))

    val uncapped = MinHashDedup.nearDuplicates(nearIdentical, 0.7).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val capped = MinHashDedup.nearDuplicates(nearIdentical, 0.7, maxBucket = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // recall loss only: every capped pair exists uncapped with the
    // identical exact-verified score, never a new or altered pair
    capped.foreach { case (k, v) => assert(uncapped(k) == v) }
    assert(capped.size <= uncapped.size)
  }

  test("cap is inert on a healthy corpus: default == uncapped (maxBucket = MaxValue)") {
    val docs = (0 until 40).map { i =>
      val rng = new scala.util.Random(2000 + i)
      (i.toLong, Seq.fill(25)(
        Iterator.continually(rng.nextPrintableChar()).filter(_.isLetter)
          .take(5).mkString.toLowerCase).mkString(" "))
    }.toDF("doc_id", "text")
    def run(maxBucket: Int) =
      MinHashDedup.nearDuplicates(docs, 0.8, maxBucket = maxBucket)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(MinHashDedup.DefaultMaxBucket) == run(Int.MaxValue))
  }
}
