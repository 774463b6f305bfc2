package graft.operators.checks

import graft.operators.checks.Checks._
import graft.operators.checks.Checks.Referential.FkRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unified check suite — the reference's "parallel check execution"
  * integration plan (reference README.md:372) as one Spark DAG: every
  * configured check contributes (check, item, status) rows to a single
  * gate report, and because they are unioned into one plan, the
  * cluster runs all their scans/aggregations CONCURRENTLY in one job
  * instead of the reference's thread-pooled sequential queries.
  */
object Suite {

  final case class TableChecks(
      tableName: String,
      df: DataFrame,
      completenessCols: Seq[String] = Nil,
      uniquenessKeys: Seq[Seq[String]] = Nil,
      formatRules: Seq[FormatRule] = Nil,
      rangeRules: Seq[RangeRule] = Nil,
      valueRules: Seq[ValueSet.ValueRule] = Nil)

  /** One (check, item, status) gate row per configured rule. */
  def gate(cfg: TableChecks,
           fkRules: Seq[(FkRule, DataFrame, DataFrame)] = Nil): DataFrame = {
    val parts = Seq.newBuilder[DataFrame]
    // completeness always runs (over completenessCols, or all columns
    // when unset) — mirrored unconditionally in gateOracleSql
    parts += Completeness.run(cfg.tableName, cfg.df, cfg.completenessCols)
      .select(lit("completeness").as("check"),
        col("column_name").as("item"), col("status"))
    cfg.uniquenessKeys.foreach { keys =>
      parts += Uniqueness.run(cfg.tableName, cfg.df, keys)
        .select(lit("uniqueness").as("check"),
          col("key_columns").as("item"), col("status"))
    }
    if (cfg.formatRules.nonEmpty)
      parts += FormatCheck.run(cfg.tableName, cfg.df, cfg.formatRules)
        .select(lit("format").as("check"), col("rule_name").as("item"), col("status"))
    if (cfg.rangeRules.nonEmpty)
      parts += RangeCheck.run(cfg.tableName, cfg.df, cfg.rangeRules)
        .select(lit("range").as("check"), col("rule_name").as("item"), col("status"))
    if (cfg.valueRules.nonEmpty)
      parts += ValueSet.run(cfg.tableName, cfg.df, cfg.valueRules)
        .select(lit("values").as("check"), col("rule_name").as("item"), col("status"))
    fkRules.foreach { case (rule, child, parent) =>
      parts += Referential.run(child, parent, rule)
        .select(lit("referential").as("check"), col("fk_name").as("item"), col("status"))
    }
    parts.result().reduce(_ unionAll _)
      .withColumn("table_name", lit(cfg.tableName))
      .select("table_name", "check", "item", "status")
      .orderBy("check", "item")
  }

  /** Oracle: the same projection over each check's own oracle SQL. */
  def gateOracleSql(tableName: String,
                    completenessCols: Seq[String],
                    uniquenessKeys: Seq[Seq[String]],
                    formatRules: Seq[FormatRule],
                    rangeRules: Seq[RangeRule],
                    valueRules: Seq[ValueSet.ValueRule],
                    fkRules: Seq[(String, String, String, String, String)]): String = {
    val parts = Seq.newBuilder[String]
    parts += s"""SELECT 'completeness' AS "check", column_name AS item, status
                |FROM (${Completeness.oracleSql(tableName, completenessCols)}) t""".stripMargin
    uniquenessKeys.foreach { keys =>
      parts += s"""SELECT 'uniqueness', key_columns, status
                  |FROM (${Uniqueness.oracleSql(tableName, keys)}) t""".stripMargin
    }
    if (formatRules.nonEmpty)
      parts += s"""SELECT 'format', rule_name, status
                  |FROM (${FormatCheck.oracleSql(tableName, formatRules)}) t""".stripMargin
    if (rangeRules.nonEmpty)
      parts += s"""SELECT 'range', rule_name, status
                  |FROM (${RangeCheck.oracleSql(tableName, rangeRules)}) t""".stripMargin
    if (valueRules.nonEmpty)
      parts += s"""SELECT 'values', rule_name, status
                  |FROM (${ValueSet.oracleSql(tableName, valueRules)}) t""".stripMargin
    if (fkRules.nonEmpty)
      parts += s"""SELECT 'referential', fk_name, status
                  |FROM (${Referential.oracleSql(fkRules)}) t""".stripMargin
    s"""SELECT '$tableName' AS table_name, * FROM (
       |${parts.result().mkString("\nUNION ALL\n")}
       |) g ORDER BY "check", item""".stripMargin
  }
}
