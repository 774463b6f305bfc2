package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("asof: latest right at-or-before each left row, null when none, ties inclusive") {
    val left = Seq(
      (1L, 1L, ts(5)),   // before any right → null
      (2L, 1L, ts(10)),  // equal ts → matches the ts(10) right (>= semantics)
      (3L, 1L, ts(30)),  // after both rights → latest (ts(20))
      (4L, 2L, ts(30))   // other key, no rights at all → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts(10), 100.0),
      (1L, ts(20), 200.0)
    ).toDF("user_id", "ts", "value")

    val res = AsOfJoin.asof(left, right, "user_id", "ts",
        rightPayload = Seq("ts", "value"), prefix = "prior_")
      .collect().map { r =>
        def opt[T](name: String, get: Int => T): Option[T] = {
          val i = r.fieldIndex(name)
          if (r.isNullAt(i)) None else Some(get(i))
        }
        r.getLong(0) -> ((opt("prior_ts", r.getTimestamp), opt("prior_value", r.getDouble)))
      }.toMap

    assert(res(1L) == ((None, None)))
    assert(res(2L) == ((Some(ts(10)), Some(100.0))))
    assert(res(3L) == ((Some(ts(20)), Some(200.0))))
    assert(res(4L) == ((None, None)))
  }

  test("asof: duplicate right timestamps resolve to the max payload deterministically") {
    val left = Seq((1L, 1L, ts(30))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(10), 5.0), (1L, ts(10), 9.0)).toDF("user_id", "ts", "value")
    val r = AsOfJoin.asof(left, right, "user_id", "ts", Seq("value")).collect().head
    assert(r.getAs[Double]("asof_value") == 9.0)
  }
}
