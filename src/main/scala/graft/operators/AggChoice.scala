package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Layout-aware prelude for full-table aggregation on a single key.
  *
  * The choice it automates (measured at sf100, BENCH_SF100.md):
  *
  *  - On a layout UNCLUSTERED by the key (TPC-H-style generation order:
  *    average key run length ≈ 1), the map-side partial aggregate
  *    achieves zero combining — every map task pays a multi-million-
  *    entry hash build and then shuffles ~1 row per input row anyway.
  *    `repartition(key)`-first carries the same shuffle bytes and
  *    builds the hash once on co-located data (q21: 49.7 → 31.5 s,
  *    q18: 61.5 → 45.0 s at 600 M rows).
  *
  *  - On a layout CLUSTERED by the key (sorted-within-partitions
  *    output, this repo's own [[graft.sources.PartitionedWrite]]
  *    writers), the combine collapses each key's run locally and the
  *    shuffle shrinks by the run length (~4:1 for lineitem-per-order)
  *    — there repartition-first would forgo the reduction.
  *
  * Decision procedure, in order:
  *
  *  1. Catalog bucketing: if the plan bottoms out in a V1 relation
  *     bucketed on exactly this key, return the frame untouched — the
  *     aggregate needs NO exchange at all (the scan's output
  *     partitioning already satisfies the distribution), and inserting
  *     a `repartition` would ADD the very shuffle bucketing pre-paid.
  *  2. Run-length probe: read a bounded per-partition prefix of the
  *     key column (first `ProbeParts` input splits × `ProbeRows` rows
  *     — file order, exactly what the map-side combine will see) and
  *     measure the average adjacent-equal run length. At or above
  *     [[CombineRunLength]] the combine at least halves shuffled rows
  *     → keep the natural plan; below it, repartition-first.
  *
  * The probe is one narrow job: key column only (pruned scan), ≤
  * ProbeParts × ProbeRows values read, other tasks complete without
  * consuming their iterators. Its cost is charged to the query that
  * uses it — honest, and O(100 ms) against the multi-second aggregates
  * it steers.
  */
object AggChoice {

  /** Minimum probed run length for map-side combine to win: at 2.0 the
    * combine halves shuffled rows, which at sf100 already beats the
    * hash-build cost it pays (the measured flat-layout run length is
    * 1.000005 — far below — and sorted layouts sit at the key's
    * group size, ~4 for lineitem-per-order).
    */
  val CombineRunLength = 2.0
  val ProbeParts = 8
  val ProbeRows = 65536

  /** True iff the frame reads a V1 file relation bucketed on exactly
    * `key` (bucket metadata only survives catalog reads, so path reads
    * always fall through to the probe).
    */
  private[graft] def bucketedOn(df: DataFrame, key: String): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.bucketSpec.exists(_.bucketColumnNames.map(_.toLowerCase)
            == Seq(key.toLowerCase))
        case _ => false
      }
    }.getOrElse(false)

  /** Average adjacent-equal run length of `key` in scan order, from a
    * bounded per-partition prefix sample. 1.0 on an empty frame (the
    * conservative answer: repartition-first).
    */
  private[graft] def avgRunLength(df: DataFrame, key: String,
                                  maxParts: Int = ProbeParts,
                                  rowsPerPart: Int = ProbeRows): Double = {
    val spark = df.sparkSession
    import spark.implicits._
    val perPart = df.select(col(key).cast("string")).as[String]
      .mapPartitions { it =>
        if (TaskContext.getPartitionId() >= maxParts) Iterator.empty
        else {
          var rows = 0L; var runs = 0L
          var prev: String = null; var first = true
          while (it.hasNext && rows < rowsPerPart) {
            val k = it.next(); rows += 1
            if (first || !java.util.Objects.equals(k, prev)) {
              runs += 1; first = false
            }
            prev = k
          }
          Iterator.single((rows, runs))
        }
      }.collect()
    val rows = perPart.map(_._1).sum
    val runs = perPart.map(_._2).sum
    if (runs == 0) 1.0 else rows.toDouble / runs
  }

  /** `df` readied for `groupBy(key)`: untouched when the layout makes
    * the map-side combine effective (bucketed catalog table, or probed
    * run length ≥ [[CombineRunLength]]), `repartition(key)`-first
    * otherwise. Result rows are identical either way — only the
    * physical shuffle placement moves.
    */
  def preAgg(df: DataFrame, key: String): DataFrame =
    if (bucketedOn(df, key) || avgRunLength(df, key) >= CombineRunLength) df
    else df.repartition(col(key))
}
