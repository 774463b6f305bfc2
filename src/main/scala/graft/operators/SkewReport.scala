package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-skew profiling: the measurement that decides whether a join or
  * aggregation on `keyCol` needs salting (`operators.Salting`) or AQE
  * skew splitting at 100 TB.
  *
  * One groupBy pass (map-side combine) computes per-key counts; the
  * top-k heavy hitters with their share of total rows and their ratio
  * to a perfectly uniform key come out of a second tiny aggregation.
  * rank<=k is a WindowGroupLimit — partial top-k before the shuffle.
  */
object SkewReport {

  /** floor(x·10^d + 0.5)/10^d — identical plain-double arithmetic in
    * Spark and DuckDB. `round()` is NOT: Spark routes doubles through
    * BigDecimal.valueOf (shortest decimal — "1.275" → 1.28) while
    * DuckDB rounds the true binary value (1.27499… → 1.27), so values
    * sitting on a .5 boundary hash-mismatch.
    */
  private def rnd(c: org.apache.spark.sql.Column, digits: Int) = {
    val p = math.pow(10, digits)
    floor(c * p + 0.5) / p
  }

  def topKeys(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(
      sum("n_rows").as("total_rows"), count(lit(1)).as("n_keys"))
    val w = Window.orderBy(col("n_rows").desc, col("key_value"))
    counts.withColumn("rank", rank().over(w).cast("int"))
      .where(col("rank") <= k)
      .crossJoin(broadcast(totals))
      .select(
        col("rank"), col("key_value").cast("string").as("key_value"), col("n_rows"),
        rnd(col("n_rows") * 100.0 / col("total_rows"), 4).as("pct_of_rows"),
        rnd(col("n_rows") * col("n_keys") / col("total_rows").cast("double"), 2)
          .as("skew_factor"))
      .orderBy("rank")
  }

  def oracleSql(table: String, keyCol: String, k: Int): String =
    s"""WITH counts AS (
       |  SELECT $keyCol AS key_value, count(*) AS n_rows
       |  FROM $table GROUP BY $keyCol),
       |totals AS (
       |  SELECT sum(n_rows) AS total_rows, count(*) AS n_keys FROM counts),
       |ranked AS (
       |  SELECT CAST(rank() OVER (ORDER BY n_rows DESC, key_value) AS INTEGER) AS rank,
       |    CAST(key_value AS VARCHAR) AS key_value, n_rows
       |  FROM counts)
       |SELECT rank, key_value, n_rows,
       |  floor(n_rows * 100.0 / total_rows * 10000 + 0.5) / 10000 AS pct_of_rows,
       |  floor(n_rows * n_keys / CAST(total_rows AS DOUBLE) * 100 + 0.5) / 100 AS skew_factor
       |FROM ranked, totals
       |WHERE rank <= $k
       |ORDER BY rank""".stripMargin
}
