package graft

import graft.operators.similarity.{IvfPqIndex, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF-PQ index (SURVEY §2 #31e): build-once/query-many and
  * incremental append. The load-bearing pin: the persisted path must
  * return EXACTLY the in-memory path's rows (training is seeded and
  * value-sampled, so a rebuild is bit-identical).
  */
class IvfPqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clustered(seed: Int, n0: Long = 0L) = {
    val rng = new scala.util.Random(seed)
    val dim = 64
    (0 until 40).flatMap { c =>
      val center = Array.fill(dim)(rng.nextGaussian())
      (0 until 12).map { m =>
        val v = center.map(x => (x + 0.07 * rng.nextGaussian()).toFloat)
        (n0 + c * 12 + m, v)
      }
    }.toDF("vec_id", "embedding")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getAs[Int]("rank"))).toSeq

  test("build → query returns exactly the in-memory path's rows") {
    val corpus = clustered(37)
    val queries = corpus.where(col("vec_id") % 12 === 0 && col("vec_id") < 60)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    IvfPqIndex.build(corpus, dir)
    val persisted = rows(IvfPqIndex.topK(dir, corpus, queries, k = 10))
    val direct = rows(Similarity.IvfPqAnn.topK(corpus, queries, k = 10))
    assert(persisted === direct)
    // knobs apply against the same stored codes (no rebuild) and agree
    // with the direct path under the same knobs (training is seeded +
    // value-sampled, so the retrain is bit-identical)
    val wide = rows(IvfPqIndex.topK(dir, corpus, queries, k = 10,
      nProbe = 32, refine = 16))
    assert(wide === rows(Similarity.IvfPqAnn.topK(corpus, queries, k = 10,
      nProbe = 32, refine = 16)))
  }

  test("index layout: parquet tables, m-byte codes, bounded model tables") {
    val corpus = clustered(41)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    IvfPqIndex.build(corpus, dir, nCells = 16, m = 8, ksub = 16)
    val codes = spark.read.parquet(s"$dir/codes").collect()
    assert(codes.length === 480)
    codes.foreach(r => assert(r.getAs[Array[Byte]]("codes").length === 8))
    assert(spark.read.parquet(s"$dir/centroids").count() === 16)
    assert(spark.read.parquet(s"$dir/codebooks").count() === 8 * 16)
    val p = spark.read.parquet(s"$dir/params").collect().head
    assert((p.getInt(0), p.getInt(1), p.getInt(2)) === ((16, 8, 16)))
  }

  test("append: new near-duplicate is found without retraining") {
    val corpus = clustered(43)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    IvfPqIndex.build(corpus, dir)
    // a new vector = an existing one nudged — its nearest neighbor
    val base = corpus.where(col("vec_id") === 7L)
      .collect().head.getSeq[Float](1).toArray
    val newVec = base.clone(); newVec(0) = newVec(0) + 0.01f
    val extra = Seq((9999L, newVec)).toDF("vec_id", "embedding")
    IvfPqIndex.append(extra, dir)
    assert(spark.read.parquet(s"$dir/codes").count() === 481)
    val full = corpus.unionAll(extra)
    val queries = extra
    val top = IvfPqIndex.topK(dir, full, queries, k = 3).collect()
    assert(top.head.getLong(1) === 7L, "appended vector's NN must be its source")
    assert(top.head.getDouble(2) > 0.99)
    // dimension drift fails loudly, never encodes a truncated slice
    val wrongDim = Seq((10000L, Array.fill(32)(0.1f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](IvfPqIndex.append(wrongDim, dir))
    assert(e.getMessage.contains("64-dimensional"))
    // a null vector used to slip past the min/max aggregates (they
    // skip nulls) and NPE inside the encode task — now rejected with
    // the same loud message class (advice-r14)
    val withNull = Seq((10001L, Some(Array.fill(64)(0.1f))), (10002L, None))
      .toDF("vec_id", "embedding")
    val eNull = intercept[IllegalArgumentException](IvfPqIndex.append(withNull, dir))
    assert(eNull.getMessage.contains("null"))
  }

  test("small corpus: fewer vectors than nCells/ksub still builds a queryable index (advice-r15)") {
    // lloyd returns min(k, sampleSize) centroids, so a 6-vector corpus
    // under nCells=32/ksub=16 trains 6 cells and 6-entry codebooks.
    // build() must record those ACTUAL shapes in dir/params — writing
    // the declared knobs made every subsequent load fail the
    // consistency require, and rebuilding could never fix it.
    val corpus = clustered(61).where(col("vec_id") < 6)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_small").toString
    IvfPqIndex.build(corpus, dir, nCells = 32, ksub = 16)
    val p = spark.read.parquet(s"$dir/params").collect().head
    assert(p.getInt(0) === 6, "params n_cells must be the trained count")
    assert(p.getInt(2) === 6, "params ksub must be the trained codebook size")
    // load → query works; results match the in-memory path exactly
    val queries = corpus.where(col("vec_id") < 2)
    assert(rows(IvfPqIndex.topK(dir, corpus, queries, k = 3))
      === rows(Similarity.IvfPqAnn.topK(corpus, queries, k = 3)))
    // append against the small model also loads fine
    val extra = Seq((9999L, Array.fill(64)(0.1f))).toDF("vec_id", "embedding")
    IvfPqIndex.append(extra, dir)
    assert(spark.read.parquet(s"$dir/codes").count() === 7)
  }

  test("params disagreeing with the model tables fails on load, not in a query") {
    val corpus = clustered(53)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_params").toString
    IvfPqIndex.build(corpus, dir)
    // sanity: consistent index loads and answers
    assert(IvfPqIndex.topK(dir, corpus, corpus.where(col("vec_id") < 2), 3).count() > 0)
    // tamper params (manual edit / partial overwrite): dir/params is
    // the declared shape, and a second source of truth must be
    // VALIDATED against the model tables on every load (advice-r14)
    Seq((99, 8, 16, 64)).toDF("n_cells", "m", "ksub", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/params")
    val e = intercept[IllegalArgumentException](
      IvfPqIndex.topK(dir, corpus, corpus.where(col("vec_id") < 2), 3))
    assert(e.getMessage.contains("internally inconsistent"))
  }
}
