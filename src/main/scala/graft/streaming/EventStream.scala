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

  /** Streaming incremental dedup: annotate a stream of documents with
    * whether their content already exists in a STATIC corpus — the
    * streaming twin of
    * [[graft.operators.dedup.Dedup.IncrementalDedup]], for ingest
    * pipelines that drop known content at arrival time instead of in a
    * nightly batch.
    *
    * Spark-first shape: a stream-static join. The static side is the
    * corpus's DISTINCT content fingerprints (computed once per
    * micro-batch planning, broadcast when small — the normal case: 16
    * bytes per unique content); no streaming state is needed at all,
    * because the static side is the state. Left-join semantics keep
    * every stream row and add `in_corpus` — callers drop or route as
    * policy dictates. In-stream duplicates are
    * [[dedupWithinWatermark]]'s job; compose both for full ingest
    * dedup.
    */
  def dedupAgainstCorpus(docs: DataFrame, corpus: DataFrame,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val fp = graft.operators.dedup.Dedup.IncrementalDedup
      .fingerprints(corpus, textCol, idCol)
      .select("fingerprint").distinct()
      .withColumn("in_corpus", lit(true))
    // no broadcast HINT: the planner broadcasts when the fingerprint
    // set measures small (the normal case) and falls back to a
    // non-broadcast stream-static join when the corpus is too big to
    // ship — a forced hint would OOM every micro-batch instead
    docs.withColumn("fingerprint",
        graft.operators.text.TextOps.Fingerprint.fingerprintCol(col(textCol)))
      .join(fp, Seq("fingerprint"), "left")
      .withColumn("in_corpus", coalesce(col("in_corpus"), lit(false)))
  }

  /** Watermarked stream-stream interval join: each left event joins
    * the right events of the same `keyCol` whose timestamps fall
    * within the `windowMinutes` BEFORE it — the streaming twin of
    * [[graft.operators.RangeJoin]] / [[graft.operators.AsOfJoin]]'s
    * candidate set. Both sides carry watermarks AND the join condition
    * bounds the time range, which is exactly what lets Spark evict
    * buffered rows once the watermark passes the interval — state is
    * bounded by arrival-rate × (watermark + window), never by stream
    * history.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   windowMinutes: Int,
                   watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("event_id"), col(keyCol).as("l_key"), col("ts").as("l_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col(keyCol).as("r_key"), col("ts").as("r_ts"), col("value"))
    l.join(r, expr(
      s"""l_key = r_key AND
         |r_ts >= l_ts - INTERVAL $windowMinutes MINUTES AND
         |r_ts <= l_ts""".stripMargin))
      .select(col("event_id"), col("l_key").as(keyCol), col("l_ts"),
        col("r_ts"), col("value"))
  }

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
