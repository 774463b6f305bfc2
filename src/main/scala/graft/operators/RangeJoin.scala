package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join: match each point row to the interval containing it
  * (same key, start ≤ point ≤ end) — Spark's planner turns a naive
  * inequality join into BroadcastNestedLoopJoin, which is O(|points|
  * × |intervals|) and falls over at scale.
  *
  * Bucketed decomposition instead: pick a bucket width, explode every
  * interval into the buckets it covers (ceil(len/width)+1 rows) and
  * every point into its single bucket, then a plain EQUI-join on
  * (key, bucket) followed by the exact containment filter. Shuffle is
  * O(|points| + |intervals| × avg_buckets_per_interval), all hash
  * joins — the standard trick behind interval-join support in Flink
  * and in genomics engines, picked here over a custom SparkPlan
  * because composition expresses it fully (design preference (a)).
  */
object RangeJoin {

  /** points(keyCol, tsCol µs-timestamp) ⋈ intervals(keyCol, startCol,
    * endCol): inner join, one output row per containing interval.
    * `bucketWidthSec` trades interval fan-out against bucket
    * selectivity — set it near the typical interval length.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keyCol: String, tsCol: String,
                      startCol: String, endCol: String,
                      bucketWidthSec: Long): DataFrame = {
    val widthUs = bucketWidthSec * 1000000L
    // integer `div`, not `/`: double division of epoch micros rounds
    def bucketOf(c: String) = expr(s"unix_micros($c) div ${widthUs}L")
    val p = points.withColumn("__bucket", bucketOf(tsCol))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    p.join(i, Seq(keyCol, "__bucket"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
