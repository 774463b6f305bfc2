package graft

import graft.operators.text.TextVectors
import graft.operators.similarity.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Feature-hashed text vectors (SURVEY §2 #35n): the model-free
  * documents→embeddings bridge. Pins determinism, the tokenizer
  * contract, the near-dup>unrelated cosine ordering, and the
  * end-to-end integrations with ANN and semantic dedup.
  */
class TextVectorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vectorize: deterministic, unit-norm, tokenizer-contract features") {
    val v1 = TextVectors.vectorize("the quick brown fox", 64)
    val v2 = TextVectors.vectorize("the quick brown fox", 64)
    assert(v1.toSeq === v2.toSeq)
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    // whitespace class, not just spaces: tabs and U+000B break tokens
    // identically to a space (same token stream ⇒ same vector)
    assert(TextVectors.vectorize("the\tquick\u000Bbrown\nfox", 64).toSeq === v1.toSeq)
    // empty and ws-only documents are the zero vector
    assert(TextVectors.vectorize("", 64).forall(_ == 0.0f))
    assert(TextVectors.vectorize(" \t ", 64).forall(_ == 0.0f))
  }

  test("near-duplicate text scores above unrelated text") {
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 3
    val nearDup = base.replace("lazy", "sleepy")
    val unrelated = "completely different subject matter about spark query engines " * 3
    val vb = TextVectors.vectorize(base, 64)
    val vn = TextVectors.vectorize(nearDup, 64)
    val vu = TextVectors.vectorize(unrelated, 64)
    assert(cos(vb, vn) > 0.8, s"near-dup cosine ${cos(vb, vn)}")
    assert(cos(vb, vn) > cos(vb, vu) + 0.3,
      s"near-dup ${cos(vb, vn)} must clear unrelated ${cos(vb, vu)}")
  }

  test("run(): embeddings-table schema, layout-independent, nulls → zero vector") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "totally other words here"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextVectors.run(docs)
    assert(out.schema.fieldNames.toSeq === Seq("vec_id", "embedding"))
    val vecs = out.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs(1L) === vecs(2L), "identical text, identical vector")
    assert(vecs(1L) !== vecs(3L))
    assert(vecs(4L).forall(_ == 0.0f), "null text is the zero vector")
    val repart = TextVectors.run(docs.repartition(5)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(repart === vecs, "partitioning must not change vectors")
  }

  test("end-to-end: documents → vectors → ANN finds the near-duplicate; SemDeDup collapses it") {
    val base = "shared boilerplate paragraph that appears in many crawled pages " * 4
    val docs = (0L until 30L).map { i =>
      val t =
        if (i == 7L) base
        else if (i == 8L) base.replaceFirst("many", "most") // one word of ~40
        else s"document $i with its own distinct content about topic ${i * 31}"
      (i, t)
    }.toDF("doc_id", "text")
    val emb = TextVectors.run(docs).localCheckpoint(true)
    // ANN: doc 7's nearest neighbor is its near-duplicate 8
    val top = Similarity.CosineTopK
      .run(emb, emb.where($"vec_id" === 7L), k = 3).collect()
    assert(top.head.getLong(1) === 8L)
    assert(top.head.getDouble(2) > 0.9)
    // semantic dedup on the hashed vectors collapses the pair
    val sem = graft.operators.dedup.SemanticDedup
      .seeded(emb, threshold = 0.9, nSeeds = 8).collect()
    val kept = sem.filter(_.getAs[Boolean]("kept")).map(_.getLong(0)).toSet
    assert(!(kept.contains(7L) && kept.contains(8L)),
      "near-duplicate pair must not both survive semantic dedup")
    assert(kept.size >= 27, s"distinct docs must survive (kept ${kept.size})")
  }
}
