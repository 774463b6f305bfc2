package graft

import graft.operators.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting produces results identical to the unsalted plan — skew
  * mitigation must never change semantics.
  */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // heavily skewed fact side: 90% of rows share key 1
  private lazy val fact = (1L to 1000L)
    .map(i => (i, if (i <= 900) 1L else i % 7 + 2, i * 0.5))
    .toDF("row_id", "k", "v")
  private lazy val dim = (1L to 10L).map(k => (k, s"name_$k")).toDF("k", "name")

  test("salted join equals plain join on skewed keys") {
    val plain = fact.join(dim, "k")
      .select("row_id", "k", "v", "name").collect().toSet
    val salted = Salting.saltedJoin(fact, dim, key = "k",
        saltSource = "row_id", factor = 8)
      .select("row_id", "k", "v", "name").collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("skew report surfaces the hot key with its share and skew factor") {
    val top = graft.operators.SkewReport.topKeys(fact, "k", 3).collect()
    assert(top.head.getAs[String]("key_value") == "1")
    assert(top.head.getAs[Long]("n_rows") == 900L)
    assert(top.head.getAs[Double]("pct_of_rows") == 90.0)
    // 8 distinct keys, 1000 rows: uniform share would be 125 rows → 7.2×
    assert(top.head.getAs[Double]("skew_factor") == 7.2)
    assert(top.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
  }

  test("two-phase salted aggregation equals direct aggregation") {
    val direct = fact.groupBy("k")
      .agg(count(lit(1)).as("n_rows"), round(sum("v"), 2).as("sum_value"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Salting.saltedCountSum(fact, "k", "v", saltSource = "row_id", factor = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == direct)
  }
}
