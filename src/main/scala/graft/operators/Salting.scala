package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins and aggregations (SURVEY §4).
  *
  * AQE's skew-join split handles most sort-merge skew at runtime, but
  * two cases still need salting: (a) a broadcast-ineligible join where
  * one hot key dwarfs every split threshold, and (b) a groupBy where a
  * hot key funnels into one reducer. Both fixes are mechanical and
  * deterministic:
  *
  *  - join: salt the skewed (large) side with `pmod(hash(salt-source),
  *    factor)` derived from a UNIFORM column (here: a per-row id), and
  *    EXPLODE the small side `factor`× so every (key, salt) bucket
  *    finds its match. Result set is identical to the unsalted join.
  *  - aggregation: two-phase — aggregate on (key, salt) first (spreads
  *    the hot key over `factor` reducers), then re-aggregate on key.
  *    Works for any algebraic aggregate.
  */
object Salting {

  /** Inner equi-join `left.key = right.key` with the LEFT side salted by
    * `factor` using `saltSource` (a roughly-uniform left column, e.g. a
    * row id) and the RIGHT side replicated `factor`×.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: String, factor: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(factor)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: count + sum per key, hot keys spread
    * over `factor` partial groups before the final combine.
    *
    * The salt MUST come from a deterministic column (`saltSource`, like
    * [[saltedJoin]]) — deriving it from monotonically_increasing_id
    * would make the shuffle key depend on partition layout, and a
    * partial task retry could then double-count or drop rows.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     saltSource: String, factor: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(saltSource)), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(key)
      .agg(sum("__n").as("n_rows"), round(sum("__s"), 2).as("sum_value"))
}
