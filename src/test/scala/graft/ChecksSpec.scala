package graft

import graft.operators.checks.Checks
import graft.operators.checks.Checks.{FormatRule, RangeRule}
import graft.operators.checks.Checks.Referential.FkRule
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the checks framework (SURVEY §2 #13-18) on tiny
  * hand-built tables with known expected outcomes.
  */
class ChecksSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val people = Seq(
    (1L, Some("alice"), Some("a@x.com"), Some(30)),
    (2L, Some("bob"), None, Some(200)),
    (3L, None, Some("bad-email"), None),
    (4L, Some("carol"), Some("c@y.org"), Some(45)),
    (4L, Some("carol"), Some("c@y.org"), Some(45))
  ).toDF("id", "name", "email", "age")

  test("Completeness counts nulls per column") {
    val rows = Checks.Completeness.run("people", people)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getString(5))).toMap
    assert(rows("id") === ((0L, "COMPLETE")))
    assert(rows("name") === ((1L, "PARTIAL")))
    assert(rows("email") === ((1L, "PARTIAL")))
    assert(rows("age") === ((1L, "PARTIAL")))
  }

  test("Uniqueness flags duplicate keys") {
    val r = Checks.Uniqueness.run("people", people, Seq("id")).collect().head
    assert(r.getAs[Long]("total_rows") === 5L)
    assert(r.getAs[Long]("distinct_keys") === 4L)
    assert(r.getAs[Long]("duplicated_keys") === 1L)
    assert(r.getAs[Long]("rows_in_duplicate_keys") === 2L)
    assert(r.getAs[String]("status") === "DUPLICATES")

    val u = Checks.Uniqueness.run("people", people.dropDuplicates("id"), Seq("id"))
      .collect().head
    assert(u.getAs[String]("status") === "UNIQUE")
  }

  test("FormatCheck validates regex rules, nulls counted separately") {
    val r = Checks.FormatCheck.run("people", people,
      Seq(FormatRule("email", "email_shape", "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$")))
      .collect().head
    assert(r.getAs[Long]("valid_count") === 3L)
    assert(r.getAs[Long]("invalid_count") === 1L)
    assert(r.getAs[Long]("null_count") === 1L)
    assert(r.getAs[String]("status") === "FAIL")
  }

  test("RangeCheck splits below/in/above/null") {
    val r = Checks.RangeCheck.run("people", people,
      Seq(RangeRule("age", "age_0_120", 0, 120))).collect().head
    assert(r.getAs[Long]("in_range_count") === 3L)
    assert(r.getAs[Long]("below_count") === 0L)
    assert(r.getAs[Long]("above_count") === 1L)
    assert(r.getAs[Long]("null_count") === 1L)
    assert(r.getAs[String]("status") === "FAIL")
  }

  test("StatsCheck computes exact stats") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = Checks.StatsCheck.run("t", df, Seq("x")).collect().head
    assert(r.getAs[Double]("min_value") === 1.0)
    assert(r.getAs[Double]("max_value") === 4.0)
    assert(r.getAs[Double]("avg_value") === 2.5)
    assert(r.getAs[Double]("median_value") === 2.5)
    assert(r.getAs[Double]("stddev_value") === 1.29)
    assert(r.getAs[Long]("non_null_count") === 4L)
  }

  test("StatsCompare flags planted drift and passes unchanged columns") {
    import org.apache.spark.sql.functions.col
    val src = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0), (4.0, 5.0)).toDF("a", "b")
    val tgt = src.select((col("a") * 1.1).as("a"), col("b"))
    val res = Checks.StatsCompare.run(Seq("a", "b"), src, tgt, tolerancePct = 1.0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(5)).toMap
    assert(res(("a", "mean")) == "DRIFT")
    assert(res(("a", "max")) == "DRIFT")
    assert(res(("a", "null_count")) == "OK") // 0 == 0 nulls on both sides
    assert(res(("b", "mean")) == "OK")
    assert(res(("b", "stddev")) == "OK")    // 0.0 == 0.0 (constant column)
  }

  test("StatsCompare detects drift on small-magnitude metrics (raw pct, not rounded)") {
    import org.apache.spark.sql.functions.col
    val src = Seq(0.05, 0.05, 0.05).toDF("a")
    val tgt = src.select((col("a") * 1.08).as("a")) // 8% drift, invisible at 2dp
    val res = Checks.StatsCompare.run(Seq("a"), src, tgt, tolerancePct = 1.0)
      .collect().map(r => r.getString(1) -> r.getString(5)).toMap
    assert(res("mean") == "DRIFT")
    assert(res("max") == "DRIFT")
  }

  test("Referential finds orphans and ignores null FKs") {
    val child = Seq((1L, Some(10L)), (2L, Some(11L)), (3L, Some(99L)), (4L, None))
      .toDF("id", "fk")
    val parent = Seq(10L, 11L, 12L).toDF("pk")
    val r = Checks.Referential.run(child, parent, FkRule("t", "fk", "pk"))
      .collect().head
    assert(r.getAs[Long]("child_rows") === 4L)
    assert(r.getAs[Long]("null_fk_rows") === 1L)
    assert(r.getAs[Long]("orphan_rows") === 1L)
    assert(r.getAs[String]("status") === "FAIL")
  }

  test("ValueSet validates allowed values, nulls counted separately") {
    val df = Seq(Some("A"), Some("N"), Some("R"), Some("X"), None)
      .toDF("flag")
    val rules = Seq(
      Checks.ValueSet.ValueRule("flag", "anr", Seq("A", "N", "R")),
      Checks.ValueSet.ValueRule("flag", "full", Seq("A", "N", "R", "X")))
    val res = Checks.ValueSet.run("t", df, rules).collect()
      .map(r => r.getAs[String]("rule_name") ->
        (r.getAs[Long]("valid_rows"), r.getAs[Long]("invalid_rows"),
          r.getAs[Long]("null_rows"), r.getAs[String]("status"))).toMap
    assert(res("anr") == ((3L, 1L, 1L, "FAIL")))
    assert(res("full") == ((4L, 0L, 1L, "PASS")))
  }
}
