package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV distinct sketch: exact below k, within error above, mergeable
  * across groups/partitions, intersection-capable.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact below k distinct values") {
    val df = (1 to 100).map(i => i % 37).toDF("x").repartition(4)
    val s = df.agg(KmvSketch.sketch(col("x")).as("s"))
      .select("s.*").as[KmvSketch.Sketch].collect().head
    assert(s.estimate == 37.0)
  }

  test("estimate within ~3 standard errors for 20k distinct at k=512") {
    val df = (1 to 20000).toDF("x").repartition(8)
    val s = df.agg(KmvSketch.sketch(col("x")).as("s"))
      .select("s.*").as[KmvSketch.Sketch].collect().head
    val err = math.abs(s.estimate - 20000) / 20000
    // stderr ≈ 1/sqrt(510) ≈ 4.4%; allow 3σ
    assert(err < 0.133, s"estimate ${s.estimate} off by ${err * 100}%")
  }

  test("NULL inputs are ignored, matching COUNT(DISTINCT) semantics") {
    val df = ((1 to 10).map(i => Some(i % 5)) ++ Seq(None, None, None))
      .toDF("x").repartition(3)
    val s = df.agg(KmvSketch.sketch(col("x")).as("s"))
      .select("s.*").as[KmvSketch.Sketch].collect().head
    assert(s.estimate == 5.0) // not 6: nulls contribute no hash
  }

  test("per-group sketches and jaccard estimate between overlapping sets") {
    val a = (1 to 5000).map(("a", _)); val b = (2501 to 7500).map(("b", _))
    val df = (a ++ b).toDF("g", "x").repartition(8)
    val sketches = df.groupBy("g").agg(KmvSketch.sketch(col("x")).as("s"))
      .select(col("g"), col("s.*")).as[(String, Int, Array[Long])]
      .collect().map { case (g, k, mins) => g -> KmvSketch.Sketch(k, mins) }.toMap
    // true jaccard = 2500 / 7500 = 0.333…
    val j = sketches("a").jaccardEstimate(sketches("b"))
    assert(math.abs(j - 1.0 / 3) < 0.1, s"jaccard estimate $j")
    // intersection estimate = jaccard × union-estimate
    val union = 7500.0
    assert(math.abs(j * union - 2500) / 2500 < 0.35)
  }
}
