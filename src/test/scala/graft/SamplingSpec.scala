package graft

import graft.operators.Sampling
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic splits/sampling: partition-layout independence,
  * disjoint+exhaustive split assignment, proportions near weights,
  * per-stratum thresholds.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ids = (0L until 10000L).toDF("doc_id")

  test("hashSplit is disjoint, exhaustive, and near the weights") {
    val split = Sampling.hashSplit(ids, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000) // exhaustive, no dropped rows
    assert(math.abs(counts("train") - 8000) < 300, s"train=${counts("train")}")
    assert(math.abs(counts("val") - 1000) < 150)
    assert(math.abs(counts("test") - 1000) < 150)
  }

  test("assignment is a pure function of the id — layout-independent") {
    val a = Sampling.hashSplit(ids, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(ids.repartition(7), "doc_id",
      Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("salt changes membership; same salt reproduces it") {
    val s0 = Sampling.sampleFraction(ids, "doc_id", 0.3, salt = 0)
      .collect().map(_.getLong(0)).toSet
    val s0again = Sampling.sampleFraction(ids, "doc_id", 0.3, salt = 0)
      .collect().map(_.getLong(0)).toSet
    val s1 = Sampling.sampleFraction(ids, "doc_id", 0.3, salt = 17)
      .collect().map(_.getLong(0)).toSet
    assert(s0 == s0again)
    assert(s0 != s1)
    assert(math.abs(s0.size - 3000) < 200)
  }

  test("stratified sampling applies per-stratum fractions") {
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val kept = Sampling.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0.5), defaultFraction = 0.1)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("en") - 1000) < 150, s"en=${kept("en")}")
    assert(math.abs(kept("de") - 200) < 80, s"de=${kept("de")}")
  }

  test("weighted sampling keeps rows in proportion to their weight") {
    import org.apache.spark.sql.functions.col
    val df = (0L until 8000L).toDF("doc_id")
      .withColumn("q", (col("doc_id") % 2 === 0).cast("double") * 0.9 + 0.05)
    // even ids weight 0.95, odd ids weight 0.05
    val kept = Sampling.weightedSample(df, "doc_id", "q")
      .groupBy((col("doc_id") % 2 === 0).as("even")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(math.abs(kept(true) - 3800) < 250, s"even=${kept(true)}")
    assert(math.abs(kept.getOrElse(false, 0L) - 200) < 100, s"odd=${kept.getOrElse(false, 0L)}")
  }

  test("NaN and NULL weights keep nothing (not everything)") {
    val df = Seq((1L, Double.NaN), (2L, Double.NaN), (3L, 1.0))
      .toDF("doc_id", "w")
      .union(Seq((4L, null.asInstanceOf[java.lang.Double]))
        .toDF("doc_id", "w"))
    val kept = Sampling.weightedSample(df, "doc_id", "w")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L)) // weight 1.0 keeps; NaN/NULL drop
  }

  test("null ids get a NULL split, never silently the last split") {
    val df = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    val out = Sampling.hashSplit(df, "doc_id", Seq("train" -> 0.9, "test" -> 0.1))
      .collect().map(r => Option(r.get(0)) -> Option(r.getString(1))).toMap
    assert(out(None).isEmpty)       // visible, filterable
    assert(out(Some(1L)).nonEmpty)
    // and sampling excludes them rather than keeping them by accident
    assert(Sampling.sampleFraction(df, "doc_id", 1.0).count() == 2)
  }

  test("sampling plans are map-side only: no exchange before the filter") {
    val plan = Sampling.sampleFraction(ids, "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
