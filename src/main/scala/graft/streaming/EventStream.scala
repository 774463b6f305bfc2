package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twin of the batch `events_hourly` query
  * (SURVEY §2 #24): hourly windowed aggregation with a watermark.
  *
  * The input is any streaming DataFrame with the `events` schema
  * (`ts timestamp, user_id long, event_type string, value double`) —
  * production wires `spark.readStream.format("kafka")...` (or a file
  * source) in front; the spec drives it with a MemoryStream.
  *
  * Scale notes: the watermark bounds state (windows older than
  * `watermark` are evicted); distinct-user counting uses
  * `approx_count_distinct` because exact COUNT(DISTINCT) is not
  * supported in streaming aggregations — the batch twin keeps the
  * exact count for oracle parity.
  */
object EventStream {

  /** Streaming exact deduplication: drop repeated `idCols` rows whose
    * event times fall within the watermark of each other
    * (`dropDuplicatesWithinWatermark`) — state holds one entry per key
    * and is EVICTED once the watermark passes, so memory is bounded by
    * the key arrival rate × watermark, never by stream history. The
    * batch twin is [[graft.operators.dedup.Dedup.ExactDedup]].
    */
  def dedupWithinWatermark(events: DataFrame, idCols: Seq[String],
                           watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Tumbling 1-hour windows keyed by event_type. Append-mode capable:
    * results emit once the watermark passes the window end.
    */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(
        col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"), col("approx_users"))
}
