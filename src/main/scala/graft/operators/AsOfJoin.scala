package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the latest right row with
  * `right.ts <= left.ts` for the same key (the time-series "most
  * recent state" join Spark has no built-in operator for; DuckDB
  * spells it ASOF JOIN, which is the oracle).
  *
  * Spark-first composition (preference (a) from the design notes —
  * no custom physical operator needed): tag both inputs, union them,
  * and take a running `last(payload, ignoreNulls)` over a window
  * partitioned by key and ordered by (ts, side, payload) — right rows
  * sort BEFORE left rows at equal timestamps, so `<=` semantics hold,
  * and the payload tiebreak makes duplicate right timestamps pick the
  * max payload deterministically. Cost: ONE shuffle+sort of
  * |left|+|right| rows on the key — never the O(|left|·|right|)
  * blow-up of a naive range join, and no per-key state on the driver.
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = right.select(rightPayload.map(col): _*).schema

    val lNorm = left.select(
      Seq(col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__payload")) ++ leftCols.map(col): _*)
    val rNorm = right.select(
      Seq(col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
        struct(rightPayload.map(col): _*).as("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lNorm.unionAll(rNorm)
      .withColumn("__filled", last("__payload", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(p => col("__filled").getField(p).as(s"$prefix$p")): _*)
  }
}
