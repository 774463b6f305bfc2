package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixture sampling: select documents per source up to a TOKEN
  * budget per source — the "data mixture" step of a training pipeline
  * (so-many-tokens of web, of code, of books), where ratios are
  * specified over tokens, not document counts.
  *
  * Selection is deterministic and layout-independent: docs are
  * consumed in [[Sampling.unitPos]] order (the family's portable hash
  * arithmetic), and a doc is kept while the running token total BEFORE
  * it is under its source's budget — so each budget is exceeded by at
  * most one document, and reruns over the same data pick the same
  * docs on any engine ([[oracleSql]] replays the rule in SQL).
  *
  * Scale shape — the running total is a distributed two-phase prefix
  * sum, NOT one window per source (a per-source window is a single
  * reducer holding that source's whole corpus):
  *  1. docs hash into `nBuckets` pos-ordered buckets per source;
  *     per-(source, bucket) token sums aggregate map-side;
  *  2. bucket offsets come from a window over the AGGREGATED frame —
  *     `sources × nBuckets` rows, trivially small at any corpus size;
  *  3. each doc's prefix = its bucket's offset + an in-bucket window
  *     cumsum, which parallelizes across `sources × nBuckets`
  *     partitions.
  * Sources absent from `budgets` are dropped (their budget is zero).
  */
object Mixture {

  val DefaultBuckets = 64

  private def bucketOf(pos: Column, nBuckets: Int): Column =
    floor(pos * nBuckets).cast("int")

  /** (doc_id, source, n_tokens) of the selected mixture, id-ordered. */
  def sample(df: DataFrame, budgets: Map[String, Long],
             sourceCol: String = "source", tokensCol: String = "n_tokens",
             idCol: String = "doc_id", nBuckets: Int = DefaultBuckets): DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0),
      "budgets must be non-empty with non-negative token targets")
    // a negative count corrupts the running prefix sum identically on
    // Spark and the SQL oracle (the harness can't catch agreement on
    // garbage) — fail the job instead
    val tokens = col(tokensCol).cast("long")
    val guardedTokens = when(tokens < 0, raise_error(format_string(
        "negative token count %s for doc_id=%s", tokens, col(idCol))))
      .otherwise(tokens)
    val base = df.select(
        col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"),
        guardedTokens.as("n_tokens"),
        Sampling.unitPos(col(idCol)).as("pos"))
      .withColumn("bucket", bucketOf(col("pos"), nBuckets))
      // only budgeted sources pay any further work; NULL-id rows are
      // EXPLICITLY excluded (no hash position ⇒ no deterministic place
      // in the consumption order) — the oracle applies the same rule,
      // rather than letting NULL join keys drop them silently
      .where(col("source").isInCollection(budgets.keys.toSeq) &&
        col("doc_id").isNotNull)
    val wOffsets = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("source", "bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
      .select(col("source"), col("bucket"),
        coalesce(sum("bucket_tokens").over(wOffsets), lit(0L)).as("offset"))
    val wInBucket = Window.partitionBy("source", "bucket")
      .orderBy("pos", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val budgetExpr = element_at(
      typedLit(budgets), col("source"))
    base.join(offsets, Seq("source", "bucket"))
      .withColumn("cum_before",
        col("offset") + coalesce(sum("n_tokens").over(wInBucket), lit(0L)))
      .where(col("cum_before") < budgetExpr)
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle: the SAME rule as one window per source — small
    * data doesn't need the two-phase sum, and agreeing with it proves
    * the phases compose to the plain prefix sum.
    */
  def oracleSql(table: String, budgets: Map[String, Long],
                tokensExpr: String, idCol: String = "doc_id"): String = {
    val pos = Sampling.unitPosSql(idCol)
    // SQL-escape embedded quotes so a source like "o'reilly" builds a
    // well-formed CASE/IN list
    def q(s: String) = s"'${s.replace("'", "''")}'"
    val budgetCase = budgets.toSeq.sortBy(_._1)
      .map { case (s, b) => s"WHEN ${q(s)} THEN $b" }
      .mkString("CASE source ", " ", " END")
    val sources = budgets.keys.toSeq.sorted.map(q).mkString(", ")
    s"""SELECT doc_id, source, n_tokens FROM (
       |  SELECT doc_id, source, n_tokens,
       |    coalesce(sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY pos, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
       |    $budgetCase AS budget
       |  FROM (
       |    SELECT $idCol AS doc_id, source,
       |      CAST($tokensExpr AS BIGINT) AS n_tokens, ($pos) AS pos
       |    FROM $table
       |    WHERE source IN ($sources) AND $idCol IS NOT NULL) t) w
       |WHERE cum_before < budget
       |ORDER BY doc_id""".stripMargin
  }
}
