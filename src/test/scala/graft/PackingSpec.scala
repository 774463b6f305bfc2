package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: capacity invariants, greedy next-fit semantics,
  * and layout-independent determinism.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Cap = 100L

  private lazy val docs = {
    val rng = new scala.util.Random(31)
    (0 until 500).map(i => (i.toLong, 10L + rng.nextInt(60)))
      .toDF("doc_id", "n_tokens")
  }

  test("every doc lands in exactly one pack; no pack exceeds capacity") {
    val packed = Packing.packs(docs, Cap).collect()
    assert(packed.length == 500)
    assert(packed.map(_.getLong(0)).distinct.length == 500)
    val byPack = packed.groupBy(_.getLong(2))
    byPack.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sum <= Cap)
    }
    // greedy fill actually packs — measured with groups big enough to
    // fill (500 docs / 4 groups; the 256-group default leaves ~2 docs
    // per group on a fixture this small, which caps fill at ~0.6)
    val report = Packing.packReport(
      Packing.packs(docs, Cap, nGroups = 4), Cap).collect()
    val avgFill = report.map(_.getDouble(3)).sum / report.length
    assert(avgFill > 0.7, s"average fill ratio $avgFill too low")
  }

  test("next-fit semantics within a group: id order, close on overflow") {
    // one group (nGroups = 1) makes the walk order the plain id order
    val tiny = Seq((1L, 40L), (2L, 40L), (3L, 40L), (4L, 90L), (5L, 10L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packs(tiny, Cap, nGroups = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // 40+40 fit; +40 overflows -> new pack; 90 overflows -> new pack; 10 fits
    assert(got(1L) == got(2L))
    assert(got(3L) == got(4L) - 1 && got(3L) != got(1L))
    assert(got(5L) == got(4L))
  }

  test("oversized docs get singleton packs, never silent truncation") {
    val over = Seq((1L, 250L), (2L, 30L), (3L, 260L))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packs(over, Cap, nGroups = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(packed.values.toSeq.distinct.length == 3)
  }

  test("negative token counts fail the job instead of corrupting packs") {
    val bad = Seq((1L, 40L), (2L, -5L)).toDF("doc_id", "n_tokens")
    val ex = intercept[org.apache.spark.SparkException] {
      Packing.packs(bad, Cap, nGroups = 1).collect()
    }
    assert(ex.getMessage.contains("negative token count") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative token count")))
  }

  test("nGroups beyond the pack_id bit budget is rejected") {
    intercept[IllegalArgumentException] {
      Packing.packs(docs, Cap, nGroups = (1 << 23) + 1)
    }
    intercept[IllegalArgumentException] { Packing.packs(docs, Cap, nGroups = 0) }
  }

  test("assignments are identical across partition layouts (determinism)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packs(df, Cap).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(run(docs) == run(docs.repartition(13)))
    assert(run(docs) == run(docs.repartition(1).sort(desc("doc_id"))))
  }
}
