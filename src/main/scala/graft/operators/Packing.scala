package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: assign documents to packs of
  * at most `capacity` tokens, so fixed-length training sequences waste
  * as little padding as possible. The standard final step between a
  * curated corpus and a training shard list.
  *
  * Determinism at scale is the design constraint: a pack assignment
  * that depends on partition layout changes when file splits shift,
  * silently reshuffling training batches between runs over identical
  * data. So documents are first routed to a FIXED number of
  * independent packing groups by id hash (layout-independent, like
  * [[Sampling.hashSplit]]), then packed within each group by a greedy
  * next-fit walk in doc-id order — a per-group sequential kernel
  * (mapPartitions after a groups-aligned repartition), because bin
  * packing is inherently order-sequential. Groups pack in parallel;
  * group count scales with the cluster, group size stays bounded by
  * corpus/nGroups.
  *
  * Next-fit (close the pack on first overflow) rather than first-fit:
  * one pass, no open-bin state beyond the current pack, and its waste
  * bound (< 2× optimal) is fine when documents are much smaller than
  * capacity — the training-corpus regime. Oversized docs (tokens >
  * capacity) get a singleton pack: truncation is the downstream
  * tokenizer's policy decision, not silently applied here.
  */
object Packing {

  val DefaultGroups = 256

  /** (doc_id, pack_group, pack_id, n_tokens) — `pack_id` unique across
    * groups (group * 2^40 + ordinal; 2^40 packs/group before overlap,
    * unreachable since group size is bounded). `tokensCol` must be a
    * non-null integral column — pair with
    * [[graft.operators.text.TextOps.TokenCount]] upstream.
    *
    * Group routing uses [[Sampling.unitPos]] — the same ENGINE-PORTABLE
    * integer arithmetic as the split/sampling family — so the whole
    * assignment, greedy walk included, is replayable in plain SQL
    * ([[oracleSql]]) and stable across engines, not just layouts.
    */
  def packs(df: DataFrame, capacity: Long,
            tokensCol: String = "n_tokens", idCol: String = "doc_id",
            nGroups: Int = DefaultGroups): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    // pack_id = group * 2^40 + ordinal: groups above 2^23 would overflow
    // the Long and silently collide pack ids
    require(nGroups > 0 && nGroups <= (1 << 23),
      s"nGroups must be in [1, ${1 << 23}], got $nGroups")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        floor(Sampling.unitPos(col(idCol)) * nGroups).cast("int").as("pack_group"),
        col(tokensCol).cast("long").as("n_tokens"))
      // one exchange keyed on the group, then an in-group id-ordered
      // walk; sortWithinPartitions costs a per-partition sort, no
      // second exchange
      .repartition(nGroups, col("pack_group"))
      .sortWithinPartitions("pack_group", "doc_id")
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        // a partition holds ≥1 complete groups (hash % nGroups →
        // disjoint); track per-group pack state, reset on group change
        var curGroup = -1
        var packOrdinal = -1L
        var filled = 0L
        it.map { case (docId, group, tokens) =>
          // a negative count would corrupt the running fill identically
          // on Spark and the SQL oracle — the harness can't catch it, so
          // fail the job instead of packing garbage
          if (tokens < 0) throw new IllegalArgumentException(
            s"negative token count $tokens for doc_id=$docId")
          if (group != curGroup) { curGroup = group; packOrdinal = -1L }
          // packOrdinal < 0 guards the group's first doc WITHOUT a
          // sentinel `filled` value (Long.MaxValue + tokens overflows)
          if (packOrdinal < 0 || filled + tokens > capacity) {
            packOrdinal += 1; filled = 0L
          }
          filled += tokens
          (docId, group, group.toLong * (1L << 40) + packOrdinal, tokens)
        }
      }
      .toDF("doc_id", "pack_group", "pack_id", "n_tokens")
  }

  /** Exact SQL twin (DuckDB): same portable group arithmetic, same
    * greedy next-fit walk as a recursive CTE stepping row-by-row in
    * doc-id order within each group. Recursion depth = max group
    * population — bounded by corpus/nGroups, the same quantity that
    * bounds the Spark kernel's per-task work.
    */
  def oracleSql(table: String, capacity: Long, tokensExpr: String,
                idCol: String = "doc_id",
                nGroups: Int = DefaultGroups): String = {
    val pos = Sampling.unitPosSql(idCol)
    s"""WITH RECURSIVE src AS (
       |  SELECT $idCol AS doc_id,
       |    CAST(floor(($pos) * $nGroups) AS INT) AS pack_group,
       |    CAST($tokensExpr AS BIGINT) AS n_tokens,
       |    row_number() OVER (
       |      PARTITION BY CAST(floor(($pos) * $nGroups) AS INT)
       |      ORDER BY $idCol) AS rn
       |  FROM $table),
       |walk(pack_group, rn, doc_id, n_tokens, ord, filled) AS (
       |  SELECT pack_group, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
       |  FROM src WHERE rn = 1
       |  UNION ALL
       |  SELECT d.pack_group, d.rn, d.doc_id, d.n_tokens,
       |    CASE WHEN w.filled + d.n_tokens > $capacity
       |      THEN w.ord + 1 ELSE w.ord END,
       |    CASE WHEN w.filled + d.n_tokens > $capacity
       |      THEN d.n_tokens ELSE w.filled + d.n_tokens END
       |  FROM walk w JOIN src d ON d.pack_group = w.pack_group AND d.rn = w.rn + 1)
       |SELECT doc_id, pack_group,
       |  pack_group * ${1L << 40} + ord AS pack_id, n_tokens
       |FROM walk ORDER BY doc_id""".stripMargin
  }

  /** Per-pack report: (pack_id, n_docs, total_tokens, fill_ratio). */
  def packReport(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .withColumn("fill_ratio", round(col("total_tokens") / capacity, 4))
      .orderBy("pack_id")
}
