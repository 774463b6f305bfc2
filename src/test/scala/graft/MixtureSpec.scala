package graft

import graft.operators.{Mixture, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mixture sampling: budget semantics, determinism across layouts, and
  * two-phase-prefix-sum equivalence with a plain per-source cumsum.
  */
class MixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = {
    val rng = new scala.util.Random(47)
    (0 until 600).map { i =>
      (i.toLong, s"src${i % 3}", 50L + rng.nextInt(100))
    }.toDF("doc_id", "source", "n_tokens")
  }

  private val Budgets = Map("src0" -> 3000L, "src1" -> 1500L)

  test("budgets bound selected tokens; unbudgeted sources are dropped") {
    val got = Mixture.sample(docs, Budgets).collect()
    val bySource = got.groupBy(_.getString(1))
    assert(!bySource.contains("src2"))
    bySource.foreach { case (s, rows) =>
      val total = rows.map(_.getLong(2)).sum
      val budget = Budgets(s)
      // over by at most the last doc, never under-using the budget
      assert(total >= budget, s"$s under budget: $total < $budget")
      assert(total - rows.map(_.getLong(2)).max < budget,
        s"$s kept a doc past the exhausted budget")
    }
  }

  test("selection equals the plain per-source prefix-sum rule (phase composition)") {
    val pos = Sampling.unitPos(col("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("pos", "doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val budgetExpr = element_at(typedLit(Budgets), col("source"))
    val expected = docs.withColumn("pos", pos)
      .where(col("source").isInCollection(Budgets.keys.toSeq))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .where(col("cum_before") < budgetExpr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = Mixture.sample(docs, Budgets).collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("assignments identical across partition layouts") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Mixture.sample(df, Budgets).collect().map(_.getLong(0)).toSeq
    assert(run(docs) == run(docs.repartition(17)))
    assert(run(docs) == run(docs.sort(desc("n_tokens"))))
  }

  test("negative token counts fail the job instead of corrupting the prefix sum") {
    val bad = Seq((1L, "src0", 40L), (2L, "src0", -7L))
      .toDF("doc_id", "source", "n_tokens")
    val ex = intercept[Exception] {
      Mixture.sample(bad, Map("src0" -> 100L)).collect()
    }
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("negative token count")) ||
        mentions(t.getCause))
    assert(mentions(ex))
  }

  test("oracle SQL escapes quoted source names") {
    val sql = Mixture.oracleSql("docs", Map("o'reilly" -> 10L), "n_tokens")
    assert(sql.contains("'o''reilly'"))
    assert(!sql.contains("'o'reilly'"))
  }

  test("zero budget selects nothing for that source") {
    val got = Mixture.sample(docs, Map("src0" -> 0L, "src1" -> 500L))
      .collect().map(_.getString(1)).toSet
    assert(got == Set("src1"))
  }
}
