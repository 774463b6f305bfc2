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

  test("range join matches brute-force inequality join incl. bucket-boundary points") {
    import graft.operators.RangeJoin
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
    // bucket width 3600s: intervals span multiple buckets; points sit on
    // starts, ends, and exact bucket boundaries
    val points = Seq(
      (1L, 1L, t(10, 0)), (2L, 1L, t(11, 0)), (3L, 1L, t(12, 30)),
      (4L, 1L, t(23, 59)), (5L, 2L, t(10, 30)), (6L, 2L, t(10, 30))
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (1L, 10L, t(10, 0), t(12, 30)),   // 3-bucket interval, closed ends
      (1L, 20L, t(12, 30), t(13, 0)),   // overlaps previous at a point
      (2L, 30L, t(9, 0), t(10, 0))      // ends before its key's points
    ).toDF("user_id", "interval_id", "start_ts", "end_ts")

    val got = RangeJoin.pointInInterval(points, intervals,
        "user_id", "ts", "start_ts", "end_ts", bucketWidthSec = 3600)
      .select("event_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      p <- points.collect(); i <- intervals.collect()
      if p.getLong(1) == i.getLong(0) &&
        !p.getTimestamp(2).before(i.getTimestamp(2)) &&
        !p.getTimestamp(2).after(i.getTimestamp(3))
    } yield (p.getLong(0), i.getLong(1))).toSet
    assert(got == want)
    // the 12:30 point is in BOTH touching intervals
    assert(got.contains((3L, 10L)) && got.contains((3L, 20L)))
    assert(!got.exists(_._1 == 4L)) // no interval covers 23:59
  }
}
