package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. Every key in [[queries]] either has a DuckDB oracle in
  * [[oracleSql]] (hash-compared by the driver at sf0.01) or is covered by
  * a ScalaTest spec against a brute-force implementation.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q5StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational query surface (SURVEY §2 #19-23) ---
    "q1_pricing"   -> ((s, d) => RelationalQueries.q1Pricing(s, d)),
    "q3_topk"      -> ((s, d) => RelationalQueries.q3TopK(s, d)),
    "q5_starjoin"  -> ((s, d) => RelationalQueries.q5StarJoin(s, d)),
    "q_window"     -> ((s, d) => RelationalQueries.qWindow(s, d)),
    "events_hourly" -> ((s, d) => RelationalQueries.eventsHourly(s, d)),
    // --- dbqt core surface (SURVEY §2 #1-2) ---
    "rowcount" -> ((s, d) => RowCount.counts(s, Tables.load(s, d))),
    "rowcount_compare" -> ((s, d) => RowCount.compare(s, Seq(
      ("customer_vs_orders", Tables(s, d, "customer"), Tables(s, d, "orders")),
      ("orders_vs_lineitem", Tables(s, d, "orders"), Tables(s, d, "lineitem")))))
  )

  /** DuckDB-equivalent SQL per query (same tables, same aliases, same
    * ordering). Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_starjoin" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, price_rank FROM (
        |  SELECT o_custkey, o_orderkey,
        |    round(o_totalprice, 2) AS o_totalprice,
        |    CAST(rank() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS price_rank
        |  FROM orders) t
        |WHERE price_rank <= 3
        |ORDER BY o_custkey, price_rank, o_orderkey""".stripMargin,
    "events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin,
    "rowcount" ->
      Tables.all.sorted.map(t => s"SELECT '$t' AS table_name, count(*) AS row_count FROM $t")
        .mkString("", "\nUNION ALL\n", "\nORDER BY table_name"),
    "rowcount_compare" ->
      """WITH pairs AS (
        |  SELECT 'customer_vs_orders' AS pair_name,
        |    (SELECT count(*) FROM customer) AS source_row_count,
        |    (SELECT count(*) FROM orders) AS target_row_count
        |  UNION ALL
        |  SELECT 'orders_vs_lineitem',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM lineitem))
        |SELECT pair_name, source_row_count, target_row_count,
        |  target_row_count - source_row_count AS difference,
        |  round((target_row_count - source_row_count) * 100.0 / source_row_count, 2)
        |    AS percentage_difference
        |FROM pairs
        |ORDER BY pair_name""".stripMargin
  )
}
