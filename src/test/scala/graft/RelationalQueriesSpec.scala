package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RelationalQueries

class RelationalQueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("q1 pricing groups all flag/status combos") {
    val rows = RelationalQueries.q1Pricing(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
    assert(rows.map(_.getLong(8)).sum > 0) // count_order is the last column
  }

  test("q3 topk returns at most 10 ordered by revenue desc") {
    val rows = RelationalQueries.q3TopK(spark, sf0001).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(3))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5 star join returns per-nation revenue") {
    val rows = RelationalQueries.q5StarJoin(spark, sf0001).collect()
    assert(rows.nonEmpty)
  }

  test("window rank <= 3 per customer") {
    val df = RelationalQueries.qWindow(spark, sf0001)
    assert(df.filter(df("price_rank") > 3).count() == 0)
    assert(df.count() > 0)
  }

  test("events hourly buckets") {
    val rows = RelationalQueries.eventsHourly(spark, sf0001).collect()
    assert(rows.nonEmpty)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
