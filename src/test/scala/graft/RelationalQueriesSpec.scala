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

  test("q17 small-qty: per-brand rows, every kept line under its part's 0.2x avg") {
    val rows = RelationalQueries.q17SmallQty(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    // brute-force the correlated rule on the driver for one brand
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables(spark, sf0001, "lineitem")
    val bp = graft.sources.Tables(spark, sf0001, "part")
      .where(col("p_brand") === "Brand#1").select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val lines = li.select("l_partkey", "l_quantity", "l_extendedprice")
      .collect().filter(r => bp.contains(r.getLong(0)))
    val avgQty = lines.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> rs.map(_.getDouble(1)).sum / rs.length }
    val expected = BigDecimal(lines.filter(r =>
        r.getDouble(1) < 0.2 * avgQty(r.getLong(0)))
      .map(_.getDouble(2)).sum / 7.0)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(_.getString(0) == "Brand#1").map(_.getDouble(1))
    assert(got.contains(expected), s"Brand#1: got $got, expected $expected")
  }

  test("q21 semi/anti: kept orders have a returned line and no open line") {
    val rows = RelationalQueries.q21SemiAnti(spark, sf0001).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables(spark, sf0001, "lineitem")
    val withR = li.where(col("l_returnflag") === "R")
      .select("l_orderkey").collect().map(_.getLong(0)).toSet
    val withO = li.where(col("l_linestatus") === "O")
      .select("l_orderkey").collect().map(_.getLong(0)).toSet
    val ord = graft.sources.Tables(spark, sf0001, "orders")
      .select("o_orderkey", "o_orderpriority").collect()
    val expected = ord.filter(r => withR.contains(r.getLong(0)) &&
        !withO.contains(r.getLong(0)))
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q21 semi/anti: all-NULL flag groups follow EXISTS semantics, not NULL-drop") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q21null").toString
    // order 1: has an 'R' line, linestatus entirely NULL → EXISTS('R') is
    // true, NOT EXISTS('O') is true → must be KEPT (a bare max() would
    // yield NULL has_open and silently drop it)
    // order 2: returnflag entirely NULL → no 'R' → dropped
    // order 3: 'R' line but also an 'O' line → dropped
    Seq(
      (1L, Some("R"), None: Option[String]),
      (1L, None, None),
      (2L, None, Some("F")),
      (3L, Some("R"), Some("O"))
    ).toDF("l_orderkey", "l_returnflag", "l_linestatus")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "1-URGENT", 10.0), (2L, "1-URGENT", 20.0), (3L, "1-URGENT", 30.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")

    val rows = RelationalQueries.q21SemiAnti(spark, dir).collect()
    assert(rows.length === 1)
    assert(rows(0).getString(0) === "1-URGENT")
    assert(rows(0).getLong(1) === 1L) // only order 1 qualifies
  }

  test("q18 large orders: exactly the orders whose lines sum over the threshold") {
    val rows = RelationalQueries.q18LargeOrders(spark, sf0001, minQty = 100.0).collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity").collect()
    val totals = li.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getDouble(1)).sum).toMap
    val expected = totals.filter(_._2 > 100.0)
    val got = rows.map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, q) => assert(math.abs(q - expected(k)) < 1e-6) }
    // descending by total quantity, orderkey tiebreak — deterministic
    val keys = rows.map(r => (-r.getDouble(4), r.getLong(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("events hourly buckets") {
    val rows = RelationalQueries.eventsHourly(spark, sf0001).collect()
    assert(rows.nonEmpty)
  }

  test("events hourly approx twin tracks the exact distinct within HLL error") {
    val exact = RelationalQueries.eventsHourly(spark, sf0001).collect()
      .map(r => (r.get(0), r.getString(1)) -> r.getLong(4)).toMap
    val approx = RelationalQueries.eventsHourlyApprox(spark, sf0001).collect()
    assert(approx.length === exact.size) // same (hour, type) buckets
    approx.foreach { r =>
      val key = (r.get(0), r.getString(1))
      val est = r.getLong(4)
      val truth = exact(key)
      // HLL++ default rsd = 5%; allow 4 sigma plus slack for tiny buckets
      val tol = math.max(4.0, truth * 0.20)
      assert(math.abs(est - truth) <= tol,
        s"bucket $key: approx $est vs exact $truth out of tolerance")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
