package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): group each user's events
  * into sessions separated by inactivity gaps > `gapMinutes`.
  *
  * Spark-first shape: one window pass computes the session boundaries
  * (lag + running sum over (user_id, ts) — a single shuffle on
  * user_id), then a hash aggregation per (user_id, session_seq). Both
  * stages are codegen'd; no state is held on the driver. The streaming
  * twin with explicit state is
  * [[graft.streaming.SessionizeStream]].
  *
  * All gap arithmetic is in epoch MICROSECONDS so the DuckDB oracle
  * (epoch_us / make_timestamp) agrees exactly with Spark
  * (unix_micros / timestamp_micros).
  */
object Sessionize {

  def sessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    // unique tie-break on event_id keeps lag() deterministic for
    // same-microsecond events
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("is_new").over(w))
      .groupBy("user_id", "session_seq")
      .agg(
        timestamp_micros(min("ts_us")).as("session_start"),
        timestamp_micros(max("ts_us")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  def oracleSql(table: String, gapMinutes: Int): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM $table),
       |g AS (
       |  SELECT user_id, event_id, ts_us, value,
       |    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
       |        OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > $gapUs
       |      THEN 1 ELSE 0 END AS is_new
       |  FROM e),
       |s AS (
       |  SELECT user_id, ts_us, value,
       |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM g)
       |SELECT user_id, session_seq,
       |  make_timestamp(min(ts_us)) AS session_start,
       |  make_timestamp(max(ts_us)) AS session_end,
       |  count(*) AS n_events,
       |  round(sum(value), 2) AS sum_value
       |FROM s GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq""".stripMargin
  }
}
