package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines: train/val/test splits, per-stratum sampling, and
  * fraction sampling that are pure functions of the row id — never of
  * partition layout, row order, or cluster size.
  *
  * Why not `df.sample()` / `randomSplit()`: their assignment depends
  * on partition iteration order, so the same table re-read with
  * different file splits lands rows in different sets — poison for
  * reproducible training runs and for joining a split decision back
  * to other derived tables. Here membership is a threshold on a
  * multiplicative hash of the id (Knuth's golden-ratio scheme), so
  * any engine — including the DuckDB oracle — reproduces it with
  * integer arithmetic, and a re-run at any scale assigns every row
  * identically. Everything is a map-side projection: zero shuffles,
  * fully codegen'd.
  */
object Sampling {

  /** 2^31: the hash ring size. Products stay under Long.MaxValue
    * (2^31 × A < 2^63), which matters because the DuckDB oracle runs
    * the same arithmetic with BIGINT overflow ERRORS, not wrapping.
    */
  val M = 2147483648L

  /** Knuth's multiplicative constant (2^32/φ), odd → a bijection
    * mod M, equidistributed over sequential ids.
    */
  val A = 2654435761L

  /** Deterministic position of an id on the unit interval [0, 1). */
  def unitPos(id: Column, salt: Long = 0): Column =
    pmod(pmod(id.cast("long") + salt, lit(M)) * A, lit(M)).cast("double") / M

  /** The same position in portable SQL (pmod spelled as ((x % m) + m) % m). */
  def unitPosSql(idExpr: String, salt: Long = 0): String =
    s"(((($idExpr + $salt) % $M + $M) % $M) * $A % $M) / $M.0"

  /** Split assignment: weights are normalized, cumulative thresholds
    * partition the unit interval, and each row's hash position picks
    * its split — disjoint, exhaustive, reproducible.
    *
    * Rows whose id is NULL have no hash position: their split is NULL
    * — visible and filterable — rather than silently polluting the
    * last split. The sampling functions below likewise exclude such
    * rows (a NULL position passes no threshold). The id column must be
    * integral-castable (long/int/date-epoch…): under Spark's ANSI mode
    * (the Spark 4 default) a string id column would make the cast
    * throw, so [[graft.app.GraftApp]]'s split tool validates the
    * column type up front.
    */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)], salt: Long = 0): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    val total = splits.map(_._2).sum
    val pos = unitPos(col(idCol), salt)
    val cums = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val assign = splits.zip(cums).init
      .foldRight(lit(splits.last._1): Column) { case (((name, _), cum), rest) =>
        when(pos < cum, name).otherwise(rest)
      }
    df.withColumn("split", when(pos.isNotNull, assign))
  }

  /** Keep a deterministic `fraction` of rows. */
  def sampleFraction(df: DataFrame, idCol: String, fraction: Double,
                     salt: Long = 0): DataFrame =
    df.where(unitPos(col(idCol), salt) < fraction)

  /** Quality-weighted sampling: each row's keep-probability is its own
    * `weightCol` (clamped to [0,1]; NULL and NaN weights keep
    * nothing — Spark orders NaN ABOVE all doubles, so without nanvl a
    * NaN would clamp to 1.0 and keep everything). The standard
    * curation move — keep high-quality documents with high
    * probability — as one deterministic map-side filter.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     salt: Long = 0): DataFrame = {
    val w = col(weightCol).cast("double")
    // explicit guard, NOT nanvl/coalesce into least/greatest: Spark's
    // least/greatest SKIP nulls (least(1.0, NULL) = 1.0), so a bare
    // clamp would keep 100% of null-weight rows
    val safe = when(w.isNull || isnan(w), 0.0)
      .otherwise(greatest(lit(0.0), least(lit(1.0), w)))
    df.where(unitPos(col(idCol), salt) < safe)
  }

  /** Oracle SQL twin of [[weightedSample]] for a SQL-expressible
    * weight, projected to the id.
    */
  def weightedOracleSql(table: String, idCol: String, weightExpr: String,
                        salt: Long = 0): String =
    s"""SELECT $idCol FROM (
       |  SELECT $idCol, ${unitPosSql(idCol, salt)} AS pos,
       |    CAST(($weightExpr) AS DOUBLE) AS w
       |  FROM $table) t
       |WHERE pos < (CASE WHEN w IS NULL OR isnan(w) THEN 0.0
       |  ELSE greatest(0.0, least(1.0, w)) END)
       |ORDER BY $idCol""".stripMargin

  /** Per-stratum fractions (e.g. keep 50% of English docs, 10% of the
    * rest): the stratum picks the threshold, the id hash picks the
    * rows. Rebalancing a skewed corpus in one codegen'd pass.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       fractions: Map[String, Double], defaultFraction: Double,
                       salt: Long = 0): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldRight(lit(defaultFraction): Column) { case ((value, frac), rest) =>
        when(col(stratumCol) === value, frac).otherwise(rest)
      }
    df.where(unitPos(col(idCol), salt) < threshold)
  }

  /** Oracle SQL twin of [[hashSplit]] projected to (id, split). */
  def splitOracleSql(table: String, idCol: String,
                     splits: Seq[(String, Double)], salt: Long = 0): String = {
    val total = splits.map(_._2).sum
    val cums = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    val cases = splits.zip(cums).init
      .map { case ((name, _), cum) => s"WHEN pos < $cum THEN '$name'" }
      .mkString(" ")
    s"""SELECT $idCol, CASE WHEN pos IS NULL THEN NULL
       |  ELSE CASE $cases ELSE '${splits.last._1}' END END AS split
       |FROM (SELECT $idCol, ${unitPosSql(idCol, salt)} AS pos FROM $table) t
       |ORDER BY $idCol""".stripMargin
  }

  /** Oracle SQL twin of [[stratifiedSample]] projected to (id, stratum). */
  def stratifiedOracleSql(table: String, idCol: String, stratumCol: String,
                          fractions: Map[String, Double], defaultFraction: Double,
                          salt: Long = 0): String = {
    val cases = fractions.toSeq.sortBy(_._1)
      .map { case (v, f) => s"WHEN $stratumCol = '$v' THEN $f" }
      .mkString(" ")
    s"""SELECT $idCol, $stratumCol
       |FROM $table
       |WHERE ${unitPosSql(idCol, salt)} < CASE $cases ELSE $defaultFraction END
       |ORDER BY $idCol""".stripMargin
  }
}
